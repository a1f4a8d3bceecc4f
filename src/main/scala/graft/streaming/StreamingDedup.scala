package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.{functions => gf}

/**
 * Streaming dedup operators over a page stream (url, warc_ts, text) — the
 * incremental counterpart of the batch pipeline's exact pass, built on
 * Structured Streaming's event-time machinery:
 *
 *  - [[exactDedupStream]]: emit only the FIRST page per normalized-content
 *    fingerprint, with state bounded by an event-time watermark
 *    (`dropDuplicatesWithinWatermark` — state for a fingerprint is dropped
 *    once the watermark passes it, so a 10^12-doc stream never accretes
 *    unbounded state; re-crawls beyond the horizon re-emit, which is the
 *    standard freshness/memory trade).
 *  - [[windowedDupStats]]: per event-time window, how many pages share each
 *    content fingerprint (watermarked windowed aggregation, append mode) —
 *    the boilerplate/duplication-rate monitor a crawl pipeline tails.
 *
 * Both are stateful but shuffle only (fingerprint, ts) tuples — the 8-byte
 * fingerprint stands in for the full text exactly as in the batch blocking
 * stage.
 */
object StreamingDedup {

  /** Normalized text + fingerprint columns (batch blocking's exact key).
    * The null filter runs on the NORMALIZED text, before hashing — xxhash64
    * never returns null (a null input hashes to the seed), so filtering the
    * hash would be dead code and every null/whitespace-only page would share
    * fingerprint 42 and be silently deduped against the others. Matching the
    * batch pipeline, such pages are excluded from the dedup state entirely. */
  private def withContentHash(df: DataFrame): DataFrame =
    df.withColumn("norm", gf.normalize_text(col("text")))
      .filter(col("norm").isNotNull)
      .withColumn("content_h", xxhash64(col("norm")))
      .drop("norm")

  /**
   * First page per content fingerprint within the watermark horizon.
   * @param stream streaming DataFrame with (url, warc_ts: timestamp, text)
   * @param watermark event-time horizon, e.g. "1 hour"
   */
  def exactDedupStream(stream: DataFrame, watermark: String): DataFrame =
    withContentHash(stream)
      .withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("content_h")
      .select(col("url"), col("warc_ts"), col("content_h"))

  /**
   * Watermarked windowed duplication stats: (window, content_h, n_pages)
   * for fingerprints seen more than once in the window.
   * @param window e.g. "1 hour"; @param watermark e.g. "2 hours"
   */
  def windowedDupStats(stream: DataFrame, window: String, watermark: String): DataFrame =
    withContentHash(stream)
      .withWatermark("warc_ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("warc_ts"), window),
        col("content_h"))
      .agg(count(lit(1)).as("n_pages"))
      .filter(col("n_pages") >= 2)
      .select(col("window.start").as("win_start"), col("content_h"), col("n_pages"))
}
