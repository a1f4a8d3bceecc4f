package graft.learn

import org.apache.spark.sql.DataFrame

/**
 * Blocking-rule learning — `DedupeBlockLearner` + `BlockLearner.learn`
 * (`training.py:36-95,136-185`): given labeled match pairs and a record
 * sample, pick the cheapest predicate subset whose blocks cover at least
 * `recall` of the matches.
 *
 * Pipeline shape (see [[Cover]]): the two coverage tables are distributed
 * DataFrame jobs over the full predicate catalog; only the collected
 * match-cover sets (≤ |matches| indices per predicate, and the reference
 * caps labeled matches in the low thousands) and the per-predicate
 * comparison-cover COUNTS cross to the driver, where the reference's own
 * branch-and-bound search runs (`candidate_types="simple"`,
 * `training.py:64-86`; the random-forest conjunction sampler draws on
 * Python's global RNG and is out of scope for a deterministic engine).
 *
 * Index predicates do not participate ([[PredicateZoo]] docs — the
 * `index_predicates=False` mode, `training.py:97-103`); this engine's
 * canopy analogues are the fixed LSH passes of [[graft.dedup.Blocking]].
 */
object BlockLearner {

  /** Reference sampling cap (`labeler.py:229` N_SAMPLED_RECORDS). */
  val SampledRecordsCap = 5000

  final case class Learned(
      predicates: Vector[String],
      /** match indices covered by the learned set */
      covered: Set[Int],
      /** the recall target actually used (after clamping to coverable) */
      targetCover: Int,
      /** total comparison-cover cost of the learned set */
      coverCount: Long)

  /**
   * `BlockLearner.learn` (`training.py:37-95`).
   *
   * @param matches (pair_id: long, f1: string, f2: string) labeled match
   *                pairs; `pair_id` must be 0..n-1
   * @param records (rid: long, f: string) record sample for comparison
   *                coverage (capped to [[SampledRecordsCap]] deterministically)
   * @param recall  fraction of matches the learned set must cover
   */
  def learn(matches: DataFrame, records: DataFrame,
            preds: Seq[NamedPredicate], recall: Double,
            maxCalls: Int = 2500): Learned = {
    val nMatches = matches.count()
    require(nMatches > 0,
      "You must supply at least one pair of matching records to learn blocking rules.")

    val sampled = Cover.sampleRecords(records, SampledRecordsCap)
    val nRecords = math.min(records.count(), SampledRecordsCap.toLong)

    val matchCover = Cover.collectMatchCover(Cover.matchCover(matches, preds), preds)
    val comparisonCounts: Map[String, Long] =
      Cover.comparisonCoverCounts(sampled, preds, nRecords).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

    // match_cover.keys - comparison_cover.keys deleted (training.py:53-55):
    // a predicate with no comparison coverage has no cost estimate
    val mc = matchCover.filter { case (n, _) => comparisonCounts.contains(n) }

    val coverable: Set[Int] =
      if (mc.isEmpty) Set.empty else mc.iterator.map(_._2).reduce(_ union _)
    var target = (recall * nMatches).toInt
    if (coverable.size < target) target = coverable.size

    val candidates = mc.map { case (n, cover) =>
      BranchAndBound.Candidate(n, cover, comparisonCounts(n))
    }
    searchAndWrap(mc, candidates, target, maxCalls)
  }

  /**
   * Record-link variant (`RecordLinkBlockLearner`, `training.py:188-266` +
   * the shared `learn`): match pairs carry one field per SIDE; comparison
   * coverage is the two-sided cross-product cover
   * ([[Cover.comparisonCoverCountsLink]]).
   */
  def learnLink(matches: DataFrame, left: DataFrame, right: DataFrame,
                preds: Seq[NamedPredicate], recall: Double,
                maxCalls: Int = 2500): Learned = {
    val nMatches = matches.count()
    require(nMatches > 0,
      "You must supply at least one pair of matching records to learn blocking rules.")
    val sl = Cover.sampleRecords(left, SampledRecordsCap)
    val sr = Cover.sampleRecords(right, SampledRecordsCap)
    val nL = math.min(left.count(), SampledRecordsCap.toLong)
    val nR = math.min(right.count(), SampledRecordsCap.toLong)

    val matchCover = Cover.collectMatchCover(Cover.matchCover(matches, preds), preds)
    val comparisonCounts: Map[String, Long] =
      Cover.comparisonCoverCountsLink(sl, sr, preds, nL, nR).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mc = matchCover.filter { case (n, _) => comparisonCounts.contains(n) }

    val coverable: Set[Int] =
      if (mc.isEmpty) Set.empty else mc.iterator.map(_._2).reduce(_ union _)
    var target = (recall * nMatches).toInt
    if (coverable.size < target) target = coverable.size

    val candidates = mc.map { case (n, cover) =>
      BranchAndBound.Candidate(n, cover, comparisonCounts(n))
    }
    searchAndWrap(mc, candidates, target, maxCalls)
  }

  private def searchAndWrap(mc: Vector[(String, Set[Int])],
                            candidates: Vector[BranchAndBound.Candidate],
                            target: Int, maxCalls: Int): Learned = {
    val finalPreds = BranchAndBound.search(candidates, target, maxCalls)
    // union the ORIGINAL covers (candidates descend the tree with reduced
    // covers — branch_and_bound.py:47-52 `_covered` also reads the original)
    val origMap = mc.toMap
    val covered =
      if (finalPreds.isEmpty) Set.empty[Int]
      else finalPreds.iterator.map(p => origMap(p.name)).reduce(_ union _)
    Learned(finalPreds.map(_.name), covered, target, finalPreds.map(_.coverCount).sum)
  }
}
