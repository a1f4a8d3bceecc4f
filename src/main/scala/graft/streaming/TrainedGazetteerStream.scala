package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dedup.DedupConfig
import graft.io.TableIO
import graft.learn.{NamedPredicate, PredicateZoo, TrainedDedupe}

/**
 * Streaming gazetteer under LEARNED settings — the trained counterpart of
 * [[GazetteerStream.run]]: each micro-batch of (rid, f) records is searched
 * against the persistent (rid, f) index with
 * [[TrainedDedupe.search]] (learned-predicate blocking, fitted-LR scoring,
 * top-n + empty-fill), results go to `sink`, and unmatched records are
 * indexed as new canonical entries — the reference Gazetteer's
 * match-then-`index`-novel loop (`api.py:938-995` + `api.py:694-736`) with
 * a trained model instead of the fixed Jaccard config.
 *
 * Index maintenance goes through the same crash-safe parquet swap as the
 * LSH gazetteer ([[TableIO.swapWrite]]/[[TableIO.recoverSwap]]; an Iceberg
 * catalog `MERGE INTO` in production). The index stores raw (rid, f) —
 * learned predicates derive their keys at search time, so re-training never
 * invalidates the store (the reference re-indexes on new settings; storing
 * fields, not keys, removes that whole failure mode).
 */
object TrainedGazetteerStream {

  /** Search-or-empty-fill one batch against the persistent index. */
  def searchBatch(batch: DataFrame, indexPath: String,
                  settings: TrainedDedupe.Settings, threshold: Double, n: Int,
                  preds: Seq[NamedPredicate], cfg: DedupConfig): DataFrame = {
    val spark = batch.sparkSession
    if (TableIO.swapTableExists(spark, indexPath))
      TrainedDedupe.search(batch, TableIO.read(spark, indexPath), settings,
        threshold, n, preds, cfg)
    else
      batch.select(col("rid").cast("long").as("query_rid")).distinct()
        .withColumn("match_rid", lit(null).cast("long"))
        .withColumn("score", lit(null).cast("double"))
  }

  /**
   * @param stream streaming DataFrame with (rid: long, f: string)
   * @param sink   receives each batch's (query_rid, match_rid, score)
   */
  def run(stream: DataFrame, indexPath: String, settings: TrainedDedupe.Settings,
          threshold: Double = 0.5, n: Int = 1, indexNovel: Boolean = true,
          preds: Seq[NamedPredicate] = PredicateZoo.stringPredicates("f"),
          cfg: DedupConfig = DedupConfig())
         (sink: DataFrame => Unit): StreamingQuery =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val b = batch.select(col("rid").cast("long").as("rid"), col("f")).persist()
        try {
          val r = searchBatch(b, indexPath, settings, threshold, n, preds, cfg)
            .persist()
          try {
            sink(r)
            if (indexNovel) {
              val novel = b.join(
                r.filter(col("match_rid").isNull)
                  .select(col("query_rid").as("rid")).distinct(), Seq("rid"))
                // one row per rid, deterministic representative (REPLACE-by-
                // key invariant, like Gazetteer.signatureRows)
                .groupBy(col("rid")).agg(max(col("f")).as("f"))
                .persist()
              try {
                // an all-matched batch must NOT rewrite the index — the swap
                // is a full-table write in the sandbox (an Iceberg MERGE of
                // zero rows in production, but skipping is free either way)
                if (!novel.isEmpty) {
                  val updated =
                    if (TableIO.swapTableExists(spark, indexPath))
                      TableIO.read(spark, indexPath)
                        .join(novel.select(col("rid")), Seq("rid"), "left_anti")
                        .unionByName(novel)
                    else novel
                  TableIO.swapWrite(spark, indexPath, updated)
                }
              } finally novel.unpersist()
            }
          } finally r.unpersist()
        } finally b.unpersist()
    }.start()
}
