package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{Blocking, DedupConfig}
import graft.expr.{functions => gf}

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
}
