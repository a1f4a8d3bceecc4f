package graft.learn

import scala.collection.mutable

/**
 * Random-forest conjunction candidates — the structural port of
 * `random_forest_candidates` (`training.py:278-328`) + `Resampler`
 * (`training.py:331-355`): many rounds of (a) sampling a sqrt-sized
 * predicate subset, (b) bootstrap-resampling the matches, (c) greedily
 * growing a K-conjunction maximizing the precision proxy
 * |covered resampled matches| / |covered comparison pairs|, registering
 * every prefix as a candidate with its conjunctive comparison cost.
 *
 * Determinism: the reference draws on Python's global RNG; here every draw
 * comes from one `java.util.Random(seed)` — its sequence is fixed by the
 * JVM spec, so candidate sets are bit-stable across machines and runs.
 *
 * Documented divergence: the reference's `Resampler` stores the
 * OCCURRENCE COUNT in place of the resampled id
 * (`training.py:344` `self.replacements[k] = [v]`), which collapses
 * distinct match ids of equal multiplicity into one element; this port
 * implements the evident intent — id k maps to itself plus (count-1)
 * fresh ids — so bootstrap multiset sizes are faithful.
 *
 * Driver-side by design, like the reference: inputs are the collected
 * match-cover sets (bounded by labeled matches) and comparison-cover pair
 * sets over the ≤5000-record sample ([[BlockLearner.SampledRecordsCap]]).
 */
object RandomForest {

  /** A conjunction candidate: ordered part names (growth order, like the
    * reference's tuple), its match cover, and its conjunctive
    * comparison-cover cost. */
  final case class Conjunction(parts: Vector[String], cover: Set[Int], coverCount: Long)

  def candidates(matchCover: Vector[(String, Set[Int])],
                 comparisonCover: Map[String, Set[Long]],
                 k: Int, nSamples: Int = 5000, seed: Long = 42L): Vector[Conjunction] = {
    val predNames = matchCover.map(_._1)
    val mc = matchCover.toMap
    val matches: Vector[Int] =
      if (matchCover.isEmpty) Vector.empty
      else matchCover.iterator.map(_._2).reduce(_ union _).toVector.sorted
    if (matches.isEmpty || predNames.isEmpty) return Vector.empty
    val predSampleSize = math.max(math.sqrt(predNames.size).toInt, 5)
    val rng = new java.util.Random(seed)

    // dedup by part SET (CompoundPredicate __eq__ is frozenset equality);
    // later rounds overwrite like dict assignment
    val out = mutable.LinkedHashMap.empty[Set[String], Conjunction]

    for (_ <- 0 until nSamples) {
      // random.sample without replacement: partial Fisher-Yates
      val pool = mutable.ArrayBuffer.from(predNames)
      val samplePreds = mutable.ArrayBuffer.empty[String]
      for (_ <- 0 until math.min(predSampleSize, pool.size)) {
        val i = rng.nextInt(pool.size)
        samplePreds += pool(i)
        pool(i) = pool.last
        pool.dropRightInPlace(1)
      }

      // bootstrap resample: id -> itself + (count-1) fresh ids
      val counts = mutable.Map.empty[Int, Int].withDefaultValue(0)
      for (_ <- matches.indices) {
        val m = matches(rng.nextInt(matches.size))
        counts(m) += 1
      }
      var fresh = matches.size + 1
      val replacements: Map[Int, Vector[Int]] = counts.iterator.map { case (id, c) =>
        val extras = Vector.tabulate(c - 1) { j => fresh + j }
        fresh += c - 1
        id -> (id +: extras)
      }.toMap
      def resample(s: Set[Int]): Set[Int] =
        s.iterator.flatMap(replacements.get(_).iterator.flatten).toSet
      val sampleMatchCover: Map[String, Set[Int]] =
        samplePreds.iterator.map(p => p -> resample(mc(p))).toMap

      // greedy K-conjunction growth (InfiniteSet & x == x at step one)
      var parts = Vector.empty[String]
      var coveredComparisons: Option[Set[Long]] = None
      var coveredMatches: Option[Set[Int]] = None
      var coveredSampleMatches: Option[Set[Int]] = None
      var pickable = samplePreds.toVector
      var step = 0
      while (step < k && pickable.nonEmpty) {
        def score(p: String): Double = {
          val num = coveredSampleMatches.fold(sampleMatchCover(p))(_ intersect sampleMatchCover(p)).size
          val den = coveredComparisons.fold(comparisonCover(p))(_ intersect comparisonCover(p)).size
          if (den == 0) 0.0 else num.toDouble / den
        }
        val next = pickable.maxBy(score) // first max wins, like Python max
        parts = parts :+ next
        coveredComparisons = Some(
          coveredComparisons.fold(comparisonCover(next))(_ intersect comparisonCover(next)))
        coveredMatches = Some(coveredMatches.fold(mc(next))(_ intersect mc(next)))
        coveredSampleMatches = Some(
          coveredSampleMatches.fold(sampleMatchCover(next))(_ intersect sampleMatchCover(next)))
        out(parts.toSet) = Conjunction(parts, coveredMatches.get, coveredComparisons.get.size.toLong)
        pickable = pickable.filterNot(_ == next)
        step += 1
      }
    }
    out.values.toVector
  }
}
