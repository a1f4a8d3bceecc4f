package graft.learn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Active-learning disagreement ranking — the batch, deterministic analogue
 * of `DisagreementLearner.pop` (`labeler.py:348-398`): surface the
 * unlabeled candidate pairs where the two learners — the classifier
 * (probability) and the blocker (0/1 coverage) — disagree most, i.e. the
 * pairs whose label buys the most information.
 *
 * The reference pops ONE pair per user interaction, sampling stochastically
 * within three priority tiers; a deterministic engine ranks the whole
 * candidate frame once and takes the top k, keeping the reference's tier
 * semantics and replacing each tier's RNG draw with its ranking key:
 *
 *  1. uncovered disagreement (`labeler.py:360-372`): classifier says match
 *     (score > 0.5) but no blocking rule covers the pair — the critical
 *     recall holes; reference samples ∝ classifier confidence, here ranked
 *     by confidence desc.
 *  2. covered pairs (`labeler.py:373-383`): reference samples uniformly
 *     across confidence; here ranked by closeness to 0.5 (max uncertainty).
 *  3. everything else (`labeler.py:384-390`): ranked by the two learners'
 *     std-dev, which for probs {s, covered} is |s - covered| / 2 — desc.
 *
 * Ties break on (id_a, id_b). A global TakeOrderedAndProject (sort + limit
 * k) — no full sort materializes at scale.
 */
object Disagreement {

  /**
   * @param candidates (id_a, id_b, score: double in [0,1],
   *                   covered: int 0/1 — blocker decision)
   * @return top-k with (id_a, id_b, score, covered, tier, rank_key)
   */
  def topK(candidates: DataFrame, k: Int): DataFrame = {
    val tier = when(col("covered") === 0 && col("score") > 0.5, 1)
      .when(col("covered") === 1, 2)
      .otherwise(3)
    // larger = more urgent within each tier
    val key = when(col("covered") === 0 && col("score") > 0.5, col("score"))
      .when(col("covered") === 1, -abs(col("score") - lit(0.5)))
      .otherwise(abs(col("score") - col("covered")) / 2)
    candidates
      .withColumn("tier", tier)
      .withColumn("rank_key", key)
      .orderBy(col("tier").asc, col("rank_key").desc, col("id_a").asc, col("id_b").asc)
      .limit(k)
  }
}
