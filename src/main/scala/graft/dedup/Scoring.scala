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
 * pair (computed by re-joining candidates to the signature table). The
 * reference's multiprocess chunked scoring loop collapses into one
 * distributed `select` — two sort-merge joins on the pair sides plus a
 * codegen'd Jaccard expression; scores are float32 like the reference's
 * score dtype (`core.py:132`).
 */
object Scoring {

  /**
   * Score candidate pairs by exact shingle-set Jaccard.
   * @param pairs (a, b) with a < b
   * @param sigs  signature table with (url, shingles)
   * @return (a, b, score: float) with score > 0 rows only
   */
  def scorePairs(pairs: DataFrame, sigs: DataFrame, idCol: String = "url",
                 minScore: Double = 0.0): DataFrame = {
    val sh = sigs.select(col(idCol).as("sid"), col("shingles"))
    pairs
      .join(sh.withColumnRenamed("sid", "a").withColumnRenamed("shingles", "sh_a"), Seq("a"))
      .join(sh.withColumnRenamed("sid", "b").withColumnRenamed("shingles", "sh_b"), Seq("b"))
      .select(col("a"), col("b"),
        gf.jaccard_sorted(col("sh_a"), col("sh_b")).cast("float").as("score"))
      .filter(col("score") > math.max(0.0, minScore)) // zero-score drop, core.py:81-84
  }
}
