package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dedup.{Blocking, DedupConfig, Gazetteer}
import graft.expr.{functions => gf}
import graft.io.TableIO

/**
 * Streaming gazetteer — the Structured Streaming realization of
 * `Gazetteer.search` (`api.py:938-995`, SURVEY.md §3.2): a stream of new
 * pages is signatured per-record (stateless Catalyst expressions, so no
 * state store is needed), LSH-band-joined against a static canonical
 * signature table (the `indexed_records` analogue, `api.py:694-776`), scored
 * by exact Jaccard and thresholded.
 *
 * The band join is a stream-static equi-join (append mode, no watermark
 * required). Top-n-per-query selection is a bounded per-batch operation —
 * apply [[graft.dedup.Matching.gazetteTopN]] inside `foreachBatch`, which is
 * also where Iceberg MERGE INTO maintenance of the canonical table goes in
 * production (index()/unindex() analogue).
 */
object GazetteerStream {

  /** Canonical signature table to index against (static side). */
  def canonicalIndex(pages: DataFrame, cfg: DedupConfig): DataFrame =
    Blocking.signatures(
      pages.select(col("url"), gf.normalize_text(col("text")).as("text"))
        .filter(col("text").isNotNull), cfg)
      .select(col("url"), col("shingles"),
        explode(gf.band_keys(col("sig"), cfg.bands)).as("band"))

  /**
   * Streaming matches: for each streamed page, canonical pages sharing at
   * least one LSH band, with exact-Jaccard score > threshold.
   * @param stream streaming DataFrame with (url, text)
   * @return streaming DataFrame (query_url, match_url, score), append mode
   */
  def matches(stream: DataFrame, canonical: DataFrame, cfg: DedupConfig,
              threshold: Double): DataFrame = {
    val streamSigs = Blocking.signatures(
      stream.select(col("url"), gf.normalize_text(col("text")).as("text"))
        .filter(col("text").isNotNull), cfg)
      .select(col("url").as("query_url"), col("shingles").as("q_shingles"),
        explode(gf.band_keys(col("sig"), cfg.bands)).as("band"))
    streamSigs
      .join(canonical.withColumnRenamed("url", "match_url")
        .withColumnRenamed("shingles", "m_shingles"), Seq("band"))
      .select(col("query_url"), col("match_url"),
        gf.jaccard_sorted(col("q_shingles"), col("m_shingles")).cast("float").as("score"))
      .filter(col("score") > threshold)
      .dropDuplicates("query_url", "match_url")
  }

  /**
   * End-to-end streaming gazetteer over the PERSISTENT index: per
   * micro-batch (`foreachBatch`), (1) search the index with empty-fill +
   * top-n (bounded per-batch work), (2) hand results to `sink`, and
   * (3) index unmatched pages as new canonical records — the reference's
   * match-then-`index`-novel workflow (`api.py:938-995` search +
   * `api.py:694-736` index), with index maintenance going through
   * [[Gazetteer.index]] (catalog MERGE INTO in production, swap-rewrite
   * in-sandbox).
   *
   * The search inside the batch is a plain batch band join, so each batch
   * sees every record indexed by all previous batches — matching the
   * sequential semantics of the reference's gazetteer loop.
   */
  def run(stream: DataFrame, indexPath: String, cfg: DedupConfig,
          threshold: Double, n: Int = 1, indexNovel: Boolean = true)
         (sink: DataFrame => Unit): StreamingQuery =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val b = batch.persist()
        try {
          // indexExists (not a raw checkpointExists probe): it runs the
          // Gazetteer's crash recovery first, so a batch arriving right
          // after a crashed swap never mistakes the recoverable index for
          // "empty" and re-indexes canonical records as novel
          val results =
            if (Gazetteer.indexExists(spark, indexPath))
              Gazetteer.search(spark, indexPath, b, cfg, threshold, n)
            else // first batch against an empty index: all queries empty-fill
              b.select(col("url").as("query_url")).distinct()
                .withColumn("match_url", lit(null).cast("string"))
                .withColumn("score", lit(null).cast("float"))
          val r = results.persist()
          try {
            sink(r)
            if (indexNovel) {
              val novelUrls = r.filter(col("match_url").isNull)
                .select(col("query_url").as("url")).distinct()
              val novelPages = b.join(novelUrls, Seq("url"))
              Gazetteer.index(spark, indexPath, novelPages, cfg)
            }
          } finally r.unpersist()
        } finally b.unpersist()
    }.start()
}
