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
 * branch-and-bound search runs. Both candidate modes are supported:
 * `candidate_types="simple"` (`training.py:64-86`) and
 * `"random forest"` conjunctions via the fixed-seed [[RandomForest]]
 * sampler (the pair SETS additionally cross to the driver in that mode,
 * 8-byte-hashed, bounded by the sample caps).
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
      coverCount: Long,
      /** each learned rule as its zoo part names — simple rules are
        * single-element; conjunctions (candidate_types="random forest")
        * carry their growth-ordered parts. Resolve to executable
        * predicates with [[PredicateZoo.resolve]]. */
      conjunctions: Vector[Vector[String]] = Vector.empty)

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
            maxCalls: Int = 2500,
            candidateTypes: String = "simple", rfSeed: Long = 42L,
            maxCollectedPairs: Long = 20000000L): Learned = {
    val nMatches = matches.count()
    require(nMatches > 0,
      "You must supply at least one pair of matching records to learn blocking rules.")
    require(candidateTypes == "simple" || candidateTypes == "random forest",
      "candidate_type is not valid")

    val sampled = Cover.sampleRecords(records, SampledRecordsCap)
    val nRecords = math.min(records.count(), SampledRecordsCap.toLong)

    val matchCover = Cover.collectMatchCover(Cover.matchCover(matches, preds), preds)
    val coverPairs = Cover.comparisonCoverPairs(sampled, preds, nRecords)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val comparisonCounts: Map[String, Long] =
      coverPairs.groupBy(org.apache.spark.sql.functions.col("predicate"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cover_count"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // match_cover.keys - comparison_cover.keys deleted (training.py:53-55):
    // a predicate with no comparison coverage has no cost estimate
    val mc = matchCover.filter { case (n, _) => comparisonCounts.contains(n) }

    val coverable: Set[Int] =
      if (mc.isEmpty) Set.empty else mc.iterator.map(_._2).reduce(_ union _)
    var target = (recall * nMatches).toInt
    if (coverable.size < target) target = coverable.size

    val simple = mc.map { case (n, cover) =>
      BranchAndBound.Candidate(n, cover, comparisonCounts(n))
    }
    val partsOf = scala.collection.mutable.Map.empty[String, Vector[String]]
    mc.foreach { case (n, _) => partsOf(n) = Vector(n) }

    // random-forest conjunctions kick in once the labeled set is big enough
    // to support them without overfitting (K = floor(log10(n)) > 1,
    // training.py:70-80); simple candidates always stay in the pool
    val k = math.max(math.floor(math.log10(nMatches.toDouble)).toInt, 1)
    val candidates =
      if (candidateTypes != "random forest" || k <= 1) simple
      else {
        val mcNames = mc.map(_._1).toSet
        // the random-forest sampler needs the pair SETS on the driver (the
        // reference holds the same sets in RAM, training.py:310-356) —
        // collect them guarded: only match-covering predicates, hashed to 8
        // bytes apiece EXECUTOR-side (only sizes and intersections matter;
        // a 2^-64 collision perturbs one score), and a loud size gate
        // BEFORE the collect so a raised sampling cap can't silently OOM
        // the driver
        val toCollect = mcNames.iterator.map(n => comparisonCounts.getOrElse(n, 0L)).sum
        require(toCollect <= maxCollectedPairs,
          s"random-forest mode would collect $toCollect covered pairs across " +
            s"${mcNames.size} predicates (cap $maxCollectedPairs, ~8 bytes/pair " +
            "on the driver); lower the record sample or drop broad predicates")
        val spark = coverPairs.sparkSession
        import spark.implicits._
        val cmpSets: Map[String, Set[Long]] = coverPairs
          .filter(org.apache.spark.sql.functions.col("predicate")
            .isin(mcNames.toSeq: _*))
          .as[(String, Long, Long)]
          .map { case (p, a, b) =>
            (p, graft.texthash.TextHash.mix64(graft.texthash.TextHash.mix64(a) ^ b))
          }
          .collect()
          .groupBy(_._1).map { case (p, xs) => p -> xs.iterator.map(_._2).toSet }
        val conj = RandomForest.candidates(mc, cmpSets, k, seed = rfSeed)
          .filter(_.parts.size > 1) // single-part entries duplicate `simple`
        conj.foreach { c => partsOf(conjName(c.parts)) = c.parts }
        simple ++ conj.map(c =>
          BranchAndBound.Candidate(conjName(c.parts), c.cover, c.coverCount))
      }
    coverPairs.unpersist(false)
    searchAndWrap(mc, candidates, target, maxCalls, partsOf.toMap)
  }

  /** Compound display name — matches [[NamedPredicate.compound]]. */
  def conjName(parts: Vector[String]): String = parts.mkString("(", " + ", ")")

  /**
   * Multi-field variant of [[learn]] — the `DataModel.predicates` surface
   * (`datamodel.py:100-106`): every variable's predicates feed ONE set-cover
   * search. `matches` carries `pair_id` + `<field>_1`/`<field>_2` columns;
   * `records` carries `rid` + field columns (see [[Cover.matchCoverMulti]]).
   * Simple candidates only — random-forest conjunctions can cross fields in
   * the reference and the engine's compound resolution is per-field, so
   * that mode stays on the single-field path.
   */
  def learnMulti(matches: DataFrame, records: DataFrame,
                 preds: Seq[(String, NamedPredicate)], recall: Double,
                 maxCalls: Int = 2500,
                 candidateTypes: String = "simple", rfSeed: Long = 42L,
                 maxCollectedPairs: Long = 20000000L): Learned = {
    val nMatches = matches.count()
    require(nMatches > 0,
      "You must supply at least one pair of matching records to learn blocking rules.")
    require(candidateTypes == "simple" || candidateTypes == "random forest",
      "candidate_type is not valid")
    val sampled = Cover.sampleRecords(records, SampledRecordsCap)
    val nRecords = math.min(records.count(), SampledRecordsCap.toLong)

    val zoo = preds.map(_._2)
    val matchCover = Cover.collectMatchCover(
      Cover.matchCoverMulti(matches, preds), zoo)
    val coverPairs = Cover.comparisonCoverPairsMulti(sampled, preds, nRecords)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val comparisonCounts: Map[String, Long] =
      coverPairs
        .groupBy(org.apache.spark.sql.functions.col("predicate"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cover_count"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mc = matchCover.filter { case (n, _) => comparisonCounts.contains(n) }

    val coverable: Set[Int] =
      if (mc.isEmpty) Set.empty else mc.iterator.map(_._2).reduce(_ union _)
    var target = (recall * nMatches).toInt
    if (coverable.size < target) target = coverable.size

    val simple = mc.map { case (n, cover) =>
      BranchAndBound.Candidate(n, cover, comparisonCounts(n))
    }
    val partsOf = scala.collection.mutable.Map.empty[String, Vector[String]]
    mc.foreach { case (n, _) => partsOf(n) = Vector(n) }

    // random-forest conjunctions across the UNION zoo — conjunction parts
    // can come from DIFFERENT fields (the reference's CompoundPredicate is
    // field-agnostic; TrainedDedupe.BoundRule binds each part to its own
    // field at blocking time)
    val k = math.max(math.floor(math.log10(nMatches.toDouble)).toInt, 1)
    val candidates =
      if (candidateTypes != "random forest" || k <= 1) simple
      else {
        val mcNames = mc.map(_._1).toSet
        val toCollect = mcNames.iterator.map(n => comparisonCounts.getOrElse(n, 0L)).sum
        require(toCollect <= maxCollectedPairs,
          s"random-forest mode would collect $toCollect covered pairs across " +
            s"${mcNames.size} predicates (cap $maxCollectedPairs, ~8 bytes/pair " +
            "on the driver); lower the record sample or drop broad predicates")
        val spark = coverPairs.sparkSession
        import spark.implicits._
        val cmpSets: Map[String, Set[Long]] = coverPairs
          .filter(org.apache.spark.sql.functions.col("predicate")
            .isin(mcNames.toSeq: _*))
          .as[(String, Long, Long)]
          .map { case (p, a, b) =>
            (p, graft.texthash.TextHash.mix64(graft.texthash.TextHash.mix64(a) ^ b))
          }
          .collect()
          .groupBy(_._1).map { case (p, xs) => p -> xs.iterator.map(_._2).toSet }
        val conj = RandomForest.candidates(mc, cmpSets, k, seed = rfSeed)
          .filter(_.parts.size > 1)
        conj.foreach { c => partsOf(conjName(c.parts)) = c.parts }
        simple ++ conj.map(c =>
          BranchAndBound.Candidate(conjName(c.parts), c.cover, c.coverCount))
      }
    coverPairs.unpersist(false)
    searchAndWrap(mc, candidates, target, maxCalls, partsOf.toMap)
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
    searchAndWrap(mc, candidates, target, maxCalls,
      mc.map { case (n, _) => n -> Vector(n) }.toMap)
  }

  /** Multi-field [[learnLink]] — `RecordLink(variables).train`: the union
    * zoo of a [[DataModel]] variable list feeds the two-sided set cover.
    * `matches` carries `pair_id` + `<field>_1`/`<field>_2`; each side
    * carries `rid` + field columns. */
  def learnLinkMulti(matches: DataFrame, left: DataFrame, right: DataFrame,
                     preds: Seq[(String, NamedPredicate)], recall: Double,
                     maxCalls: Int = 2500): Learned = {
    val nMatches = matches.count()
    require(nMatches > 0,
      "You must supply at least one pair of matching records to learn blocking rules.")
    val sl = Cover.sampleRecords(left, SampledRecordsCap)
    val sr = Cover.sampleRecords(right, SampledRecordsCap)
    val nL = math.min(left.count(), SampledRecordsCap.toLong)
    val nR = math.min(right.count(), SampledRecordsCap.toLong)

    val matchCover = Cover.collectMatchCover(
      Cover.matchCoverMulti(matches, preds), preds.map(_._2))
    val comparisonCounts: Map[String, Long] =
      Cover.comparisonCoverCountsLinkMulti(sl, sr, preds, nL, nR).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mc = matchCover.filter { case (n, _) => comparisonCounts.contains(n) }

    val coverable: Set[Int] =
      if (mc.isEmpty) Set.empty else mc.iterator.map(_._2).reduce(_ union _)
    var target = (recall * nMatches).toInt
    if (coverable.size < target) target = coverable.size

    val candidates = mc.map { case (n, cover) =>
      BranchAndBound.Candidate(n, cover, comparisonCounts(n))
    }
    searchAndWrap(mc, candidates, target, maxCalls,
      mc.map { case (n, _) => n -> Vector(n) }.toMap)
  }

  private def searchAndWrap(mc: Vector[(String, Set[Int])],
                            candidates: Vector[BranchAndBound.Candidate],
                            target: Int, maxCalls: Int,
                            partsOf: Map[String, Vector[String]]): Learned = {
    val finalPreds = BranchAndBound.search(candidates, target, maxCalls)
    // union the ORIGINAL CANDIDATE covers (candidates descend the tree with
    // reduced covers — branch_and_bound.py:47-52 `_covered` also reads the
    // original); a conjunction's original cover is its own entry, not mc's
    val origMap = candidates.iterator.map(c => c.name -> c.cover).toMap
    val covered =
      if (finalPreds.isEmpty) Set.empty[Int]
      else finalPreds.iterator.map(p => origMap(p.name)).reduce(_ union _)
    Learned(finalPreds.map(_.name), covered, target, finalPreds.map(_.coverCount).sum,
      finalPreds.map(p => partsOf(p.name)))
  }
}
