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

  /** Signature rows stored in the index: (url, shingles, sig, simhash).
    * One row per url: a batch carrying the same url twice would break the
    * REPLACE-by-url invariant downstream (the Iceberg `MERGE INTO` fails at
    * runtime on multi-source matches; the parquet branch would insert both)
    * — so duplicates collapse here to the max normalized text per url
    * (deterministic under any partitioning, unlike dropDuplicates' first-
    * seen row), matching the last-write-wins spirit of the reference's
    * `REPLACE INTO` loop (`api.py:696-736`). */
  def signatureRows(pages: DataFrame, cfg: DedupConfig): DataFrame =
    Blocking.signatures(
      pages.select(col("url"), gf.normalize_text(col("text")).as("text"))
        .filter(col("text").isNotNull)
        .groupBy(col("url")).agg(max(col("text")).as("text")), cfg)
      .select(col("url"), col("shingles"), col("sig"), col("simhash"))

  /** Catalog MERGE for the production Iceberg path: REPLACE-upsert by url
    * (`api.py:696-736`'s `REPLACE INTO` semantics). `updatesView` is a temp
    * view holding the new signature rows. */
  def mergeSql(table: String, updatesView: String): String =
    s"""MERGE INTO $table t USING $updatesView u ON t.url = u.url
       |WHEN MATCHED THEN UPDATE SET *
       |WHEN NOT MATCHED THEN INSERT *""".stripMargin

  /** Catalog DELETE for the production Iceberg path (`api.py:747-776`). */
  def deleteSql(table: String, urlsView: String): String =
    s"DELETE FROM $table WHERE url IN (SELECT url FROM $urlsView)"

  // the crash-safe parquet swap lives in TableIO (swapWrite/recoverSwap),
  // shared with the trained streaming gazetteer
  private def rewrite(spark: SparkSession, path: String, df: DataFrame): Unit =
    TableIO.swapWrite(spark, path, df)

  /** Live index presence, after crash recovery. Public: any caller probing
    * for the index (e.g. [[graft.streaming.GazetteerStream.run]]) MUST go
    * through this — a raw `checkpointExists` probe after a crashed swap
    * (live renamed to `__old`, promotion not yet done) would see "no index",
    * empty-fill every query as novel, and then re-index already-canonical
    * records when `index`'s own recovery restores the old table. */
  def indexExists(spark: SparkSession, path: String): Boolean =
    TableIO.swapTableExists(spark, path)

  /** Add (or replace, by url) records in the persistent index. Production
    * (Iceberg catalog): an incremental `MERGE INTO` — O(changed records),
    * never a full-table rewrite. Sandbox parquet: temp + swap rewrite. */
  def index(spark: SparkSession, path: String, pages: DataFrame, cfg: DedupConfig): Unit = {
    val rows = signatureRows(pages, cfg)
    if (TableIO.icebergAvailable(spark)) {
      if (!spark.catalog.tableExists(path)) TableIO.write(rows, path)
      else {
        rows.createOrReplaceTempView("__graft_gazette_updates")
        spark.sql(mergeSql(path, "__graft_gazette_updates"))
      }
    } else {
      val updated =
        if (indexExists(spark, path))
          TableIO.requireIntShingles(TableIO.read(spark, path), s"gazetteer index $path")
            .join(rows.select(col("url")), Seq("url"), "left_anti")
            .unionByName(rows)
        else rows
      rewrite(spark, path, updated)
    }
  }

  /** Remove records (by url) from the persistent index. Production: a
    * catalog `DELETE WHERE`; sandbox parquet: anti-join + swap rewrite. */
  def unindex(spark: SparkSession, path: String, urls: DataFrame): Unit = {
    if (TableIO.icebergAvailable(spark)) {
      if (!spark.catalog.tableExists(path)) return
      urls.select(col("url")).createOrReplaceTempView("__graft_gazette_unindex")
      spark.sql(deleteSql(path, "__graft_gazette_unindex"))
    } else {
      if (!indexExists(spark, path)) return
      val updated = TableIO.requireIntShingles(TableIO.read(spark, path), s"gazetteer index $path")
        .join(urls.select(col("url")), Seq("url"), "left_anti")
      rewrite(spark, path, updated)
    }
  }

  /** The indexed table with derived LSH band keys, ready for the band join. */
  def bandedIndex(spark: SparkSession, path: String, cfg: DedupConfig): DataFrame = {
    if (!TableIO.icebergAvailable(spark)) TableIO.recoverSwap(spark, path)
    TableIO.requireIntShingles(TableIO.read(spark, path), s"gazetteer index $path")
      .select(col("url").as("match_url"), col("shingles").as("m_shingles"),
        explode(gf.band_keys(col("sig"), cfg.bands)).as("band"))
  }

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
