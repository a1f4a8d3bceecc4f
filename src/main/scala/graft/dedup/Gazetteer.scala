package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.{functions => gf}
import graft.io.TableIO

/**
 * Persistent gazetteer index maintenance + search — the distributed
 * `GazetteerMatching.index` / `unindex` / `search` (`api.py:694-776`,
 * `api.py:938-995`) over a signature table behind [[TableIO]].
 *
 * The stored table is the `indexed_records` analogue: one row per canonical
 * record with its shingle set and MinHash signature (block keys are derived,
 * not stored — the LSH generalization of the reference's
 * `(block_key, record_id)` rows). Maintenance semantics match the reference:
 *
 *  - `index`: REPLACE upsert — a record with the same key as a previously
 *    indexed record replaces it (`api.py:696-736`'s `REPLACE INTO` +
 *    `indexed_data.update`);
 *  - `unindex`: delete by record key (`api.py:747-776`).
 *
 * In production (Iceberg catalog configured) both map to `MERGE INTO` /
 * `DELETE WHERE` on the catalog table; the sandbox parquet path realizes the
 * same semantics with a write-to-temp + atomic-swap rewrite, which also
 * avoids reading and overwriting the same files in one job.
 *
 * `search` applies `_format_search_results` (`api.py:1007-1024`): EVERY
 * query surfaces in the output — queries with no candidate above the
 * threshold get one row with null match/score, the `(k, ())` empty result.
 */
object Gazetteer {

  /** Signature rows stored in the index: (url, shingles, sig, simhash). */
  def signatureRows(pages: DataFrame, cfg: DedupConfig): DataFrame =
    Blocking.signatures(
      pages.select(col("url"), gf.normalize_text(col("text")).as("text"))
        .filter(col("text").isNotNull), cfg)
      .select(col("url"), col("shingles"), col("sig"), col("simhash"))

  /** Parquet-path rewrite with temp + swap (the sandbox stand-in for an
    * Iceberg MERGE/DELETE: never deletes data before the replacement is
    * fully written). */
  private def rewrite(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val tmp = path + "__tmp"
    TableIO.write(df, tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
  }

  /** Add (or replace, by url) records in the persistent index. */
  def index(spark: SparkSession, path: String, pages: DataFrame, cfg: DedupConfig): Unit = {
    val rows = signatureRows(pages, cfg)
    val updated =
      if (TableIO.checkpointExists(spark, path))
        TableIO.read(spark, path)
          .join(rows.select(col("url")), Seq("url"), "left_anti")
          .unionByName(rows)
      else rows
    rewrite(spark, path, updated)
  }

  /** Remove records (by url) from the persistent index. */
  def unindex(spark: SparkSession, path: String, urls: DataFrame): Unit = {
    if (!TableIO.checkpointExists(spark, path)) return
    val updated = TableIO.read(spark, path)
      .join(urls.select(col("url")), Seq("url"), "left_anti")
    rewrite(spark, path, updated)
  }

  /** The indexed table with derived LSH band keys, ready for the band join. */
  def bandedIndex(spark: SparkSession, path: String, cfg: DedupConfig): DataFrame =
    TableIO.read(spark, path)
      .select(col("url").as("match_url"), col("shingles").as("m_shingles"),
        explode(gf.band_keys(col("sig"), cfg.bands)).as("band"))

  /**
   * Batch search with empty-fill: top-`n` canonical matches above
   * `threshold` per query; queries with no match surface with null
   * match_url/score (`_format_search_results`, `api.py:1007-1024`).
   * @return (query_url, match_url, score) — one row per (query, match),
   *         or a single null-match row for unmatched queries
   */
  def search(spark: SparkSession, path: String, queries: DataFrame,
             cfg: DedupConfig, threshold: Double, n: Int = 1): DataFrame = {
    val qSigs = signatureRows(queries, cfg)
      .select(col("url").as("query_url"), col("shingles").as("q_shingles"),
        explode(gf.band_keys(col("sig"), cfg.bands)).as("band"))
    val scored = qSigs
      .join(bandedIndex(spark, path, cfg), Seq("band"))
      .select(col("query_url"), col("match_url"),
        gf.jaccard_sorted(col("q_shingles"), col("m_shingles")).cast("float").as("score"))
      .dropDuplicates("query_url", "match_url")
    val top = Matching.gazetteTopN(
      scored.withColumnRenamed("query_url", "a").withColumnRenamed("match_url", "b"),
      threshold, n)
      .select(col("a").as("query_url"), col("b").as("match_url"), col("score"))
    // empty-fill: every query surfaces, matched or not
    queries.select(col("url").as("query_url")).distinct()
      .join(top, Seq("query_url"), "left")
  }
}
