package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.{functions => gf}

/**
 * Pairwise scoring stage — the analogue of `core.scoreDuplicates`
 * (`core.py:102-187`): featurize each candidate pair and produce
 * `P(match) ∈ [0,1]`, dropping exact zeros (`core.py:81-84`).
 *
 * Per the north rule the classifier is not a learned LR but a fixed,
 * deterministic similarity: exact Jaccard over the char-shingle sets of the
 * pair. Scores are float32 like the reference's score dtype (`core.py:132`).
 *
 * Scale design: candidate pairs can outnumber documents 100:1, so the pair
 * stream must NEVER carry the full shingle arrays end to end (at 10^12 docs
 * that join alone would shuffle petabytes). Scoring is therefore two-phase:
 *
 *  1. SimHash prefilter — join the pairs to the 8-byte simhash fingerprints
 *     (a ~24-byte payload per side; AQE broadcasts the fingerprint map when
 *     it is small) and drop pairs with Hamming distance > `maxHamming`.
 *     This is the secondary-fingerprint role the north rule assigns SimHash,
 *     and the cheap-filter-then-verify shape of the reference's index
 *     predicates (`predicates.py:224-273`).
 *  2. Exact verify — only survivors join the shingle arrays and get the
 *     exact Jaccard score; pairs below `minScore` drop (the classifier-zero
 *     analogue).
 */
object Scoring {

  /**
   * @param pairs (a, b) with a < b
   * @param sigs  signature table with (url, shingles, simhash)
   * @param minScore  exact-Jaccard floor (see [[DedupConfig.minScore]])
   * @param maxHamming SimHash prefilter radius; 64 disables the prefilter
   * @return (a, b, score: float) with score > max(0, minScore) rows only
   */
  def scorePairs(pairs: DataFrame, sigs: DataFrame, idCol: String = "url",
                 minScore: Double = 0.0, maxHamming: Int = 64,
                 dedupePairs: Boolean = false): DataFrame = {
    val prefiltered =
      if (maxHamming >= 64 || !sigs.columns.contains("simhash")) pairs
      else {
        // fingerprint map is ~24 bytes/doc but one row per DOCUMENT — at
        // 10^12 docs it cannot go through the driver. No broadcast hint:
        // AQE turns the join into a broadcast probe when the map is under
        // the threshold and a shuffled hash/sort-merge join otherwise.
        val fp = sigs.select(col(idCol).as("sid"), col("simhash"))
        pairs
          .join(fp.withColumnRenamed("sid", "a").withColumnRenamed("simhash", "h_a"), Seq("a"))
          .join(fp.withColumnRenamed("sid", "b").withColumnRenamed("simhash", "h_b"), Seq("b"))
          .filter(gf.hamming64(col("h_a"), col("h_b")) <= maxHamming)
          .select(col("a"), col("b"))
      }
    // pair-uniqueness invariant (api.py:224-227) established here when the
    // blocking stage deferred it
    val surviving = if (dedupePairs) prefiltered.distinct() else prefiltered

    // shuffle_hash: the shingle side carries ~KB array payloads per row —
    // hash-building it avoids sort-merge's full sort of the array columns
    // (2x the memory traffic) at any scale where it exceeds broadcast size
    val sh = sigs.select(col(idCol).as("sid"), col("shingles")).hint("shuffle_hash")
    surviving
      .join(sh.withColumnRenamed("sid", "a").withColumnRenamed("shingles", "sh_a"), Seq("a"))
      .join(sh.withColumnRenamed("sid", "b").withColumnRenamed("shingles", "sh_b"), Seq("b"))
      .select(col("a"), col("b"),
        gf.jaccard_sorted(col("sh_a"), col("sh_b")).cast("float").as("score"))
      .filter(col("score") > math.max(0.0, minScore)) // zero-score drop, core.py:81-84
  }
}
