package graft.learn

/**
 * Driver-side branch-and-bound set-cover search over predicate coverage —
 * an exact semantic port of `branch_and_bound.py:13-90` (`search` and its
 * helpers). The search space is tiny by construction (coverage sets over at
 * most a few thousand labeled matches, candidate predicates in the dozens,
 * a hard `maxCalls` budget of 2500 like the reference's `training.py:88`),
 * so this is driver-side by design — the DISTRIBUTED part of learning is
 * building the coverage tables ([[Cover]]).
 *
 * Determinism: the reference's tie-breaks ride on Python dict insertion
 * order (`max` returns the first maximal key); coverage here is an ordered
 * `Vector` in predicate declaration order and `maxBy` returns the first
 * maximum, so learned predicate sets are bit-stable.
 */
object BranchAndBound {

  /** A candidate predicate: its (possibly reduced) match-cover set and its
    * comparison-cover cost (`predicate.cover_count`, `training.py:263`). */
  final case class Candidate(name: String, cover: Set[Int], coverCount: Long)

  /** `branch_and_bound.py:13-14`. */
  private def reachable(cands: Vector[Candidate]): Int =
    if (cands.isEmpty) 0 else cands.iterator.map(_.cover).reduce(_ union _).size

  /** `branch_and_bound.py:27-34` — subtract `covered` from every cover,
    * dropping candidates left with nothing. */
  private def uncoveredBy(cands: Vector[Candidate], covered: Set[Int]): Vector[Candidate] =
    cands.flatMap { p =>
      val still = p.cover diff covered
      if (still.nonEmpty) Some(p.copy(cover = still)) else None
    }

  /**
   * `branch_and_bound.py:46-90` — returns the cheapest (by summed
   * cover_count) predicate subset whose ORIGINAL covers union to at least
   * `target` matches, exploring at most `maxCalls` nodes.
   */
  def search(originalCover: Vector[Candidate], target: Int, maxCalls: Int = 2500): Vector[Candidate] = {
    val original: Map[String, Set[Int]] =
      originalCover.iterator.map(c => c.name -> c.cover).toMap

    def covered(partial: Vector[Candidate]): Int =
      if (partial.isEmpty) 0
      else partial.iterator.map(c => original(c.name)).reduce(_ union _).size
    def score(partial: Vector[Candidate]): Double = partial.iterator.map(_.coverCount.toDouble).sum

    var cheapestScore = Double.PositiveInfinity
    var cheapest = Vector.empty[Candidate]
    var toExplore = List((originalCover, Vector.empty[Candidate]))
    var calls = maxCalls

    while (toExplore.nonEmpty && calls > 0) {
      val (cands0, partial) = toExplore.head
      toExplore = toExplore.tail

      val cov = covered(partial)
      val sc = score(partial)

      if (cov < target) {
        val window = cheapestScore - sc
        val cands = cands0.filter(_.coverCount < window)
        val reach = reachable(cands) + cov
        if (cands.nonEmpty && reach >= target) {
          // _order_by: (|current cover|, -cover_count), first max wins
          val best = cands.maxBy(p => (p.cover.size, -p.coverCount))
          val reduced = cands.filterNot(p =>
            best.coverCount <= p.coverCount && p.cover.subsetOf(best.cover))
          val remaining = uncoveredBy(cands, best.cover)
          // Python appends (reduced, partial) then (remaining, partial+best)
          // and pops the LAST — prepending in the same order gives the same
          // LIFO visit order
          toExplore = (remaining, partial :+ best) :: (reduced, partial) :: toExplore
        }
      } else if (sc < cheapestScore) {
        cheapest = partial
        cheapestScore = sc
      }
      calls -= 1
    }
    cheapest
  }
}
