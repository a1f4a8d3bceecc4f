package graft.cluster

import scala.collection.mutable

/**
 * In-JVM clustering semantics matching the reference end to end — used two
 * ways:
 *  1. per-connected-component inside the distributed pipeline
 *     ([[clusterComponent]] runs in `flatMapGroups`, components being capped
 *     at `maxComponents` nodes upstream), and
 *  2. as the whole-graph small-scale oracle ([[cluster]]) the golden fixtures
 *     and property tests compare the Spark pipeline against
 *     (`tests/test_dedupe.py:98-198` semantics).
 *
 * Reference: `dedupe/clustering.py` — `connected_components` (:20-94),
 * `union_find` (:97-170), `condensedDistance` (:173-210), `cluster`
 * (:213-255), `confidences` (:258-281), `greedyMatching` (:284-296),
 * `gazetteMatching` (:299-311).
 */
object LocalClustering {

  /** Scored candidate pair with the reference invariant a < b
    * (`api.py:336`, smaller id first). */
  final case class Edge[A](a: A, b: A, score: Double)

  final case class ClusterOut[A](members: Vector[A], confidences: Vector[Double])

  /**
   * Hierarchical clustering of ONE connected component's edge list —
   * semantics of the per-sub_graph body of `cluster` (`clustering.py:230-255`):
   * condensed distance matrix (unscored pairs at distance 1), centroid
   * linkage, fcluster at 1-threshold, confidences; single-edge components kept
   * iff score > threshold; flat clusters of size 1 dropped.
   */
  def clusterComponent[A](edges: Seq[Edge[A]], threshold: Double)(
      implicit ord: Ordering[A]): Seq[ClusterOut[A]] = {
    if (edges.isEmpty) return Nil
    if (edges.size == 1) {
      val e = edges.head
      return if (e.score > threshold)
        Seq(ClusterOut(Vector(e.a, e.b), Vector(e.score, e.score)))
      else Nil
    }
    // candidate_set = numpy.unique(pairs) -> sorted distinct ids (clustering.py:191)
    val ids = edges.flatMap(e => Seq(e.a, e.b)).distinct.sorted.toVector
    val n = ids.length
    val index = ids.zipWithIndex.toMap
    val condensed = Array.fill(n * (n - 1) / 2)(1.0) // unscored pairs: distance 1 (clustering.py:203)
    edges.foreach { e =>
      val i = index(e.a); val j = index(e.b)
      val (r, c) = if (i < j) (i, j) else (j, i)
      condensed(Hierarchical.condensedIndex(r, c, n)) = 1.0 - e.score
    }
    val merges = Hierarchical.linkageCentroid(condensed, n)
    val labels = Hierarchical.fclusterDistance(merges, n, 1.0 - threshold)
    val byLabel = mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[Int]]
    var i = 0
    while (i < n) {
      byLabel.getOrElseUpdate(labels(i), mutable.ArrayBuffer.empty) += i
      i += 1
    }
    byLabel.values.toSeq.collect {
      case ms if ms.size > 1 =>
        val arr = ms.toArray
        val conf = Hierarchical.confidences(arr, condensed, n)
        ClusterOut(arr.sorted.toVector.map(ids), conf.toVector)
    }
  }

  /** Union-find connected components over an edge list; returns the edges
    * grouped by component (semantics of `union_find`, `clustering.py:97-170` —
    * component identity only; internal label order is not semantic). */
  def connectedComponents[A](edges: Seq[Edge[A]]): Seq[Seq[Edge[A]]] = {
    val parent = mutable.Map.empty[A, A]
    def find(x: A): A = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { e =>
      parent.getOrElseUpdate(e.a, e.a); parent.getOrElseUpdate(e.b, e.b)
      val ra = find(e.a); val rb = find(e.b)
      if (ra != rb) parent(ra) = rb
    }
    edges.groupBy(e => find(e.a)).values.toSeq
  }

  /**
   * `_connected_components` with the oversized-component refilter
   * (`clustering.py:51-94`): a component with more than `maxComponents`
   * distinct nodes is re-thresholded at sigmoid(logit(min_score)+1), dropping
   * at least its 2 lowest-score edges, and re-split recursively.
   */
  def refilteredComponents[A](edges: Seq[Edge[A]], maxComponents: Int)(
      implicit ord: Ordering[A]): Seq[Seq[Edge[A]]] =
    connectedComponents(edges).flatMap { comp =>
      val nEdges = comp.size
      val needsFilter = (nEdges + 1 > maxComponents) && {
        val nNodes = comp.flatMap(e => Seq(e.a, e.b)).distinct.size
        nNodes > maxComponents
      }
      if (!needsFilter) Seq(comp)
      else {
        val minScore = comp.map(_.score).min
        val logit = math.log(minScore) - math.log(1 - minScore)
        val threshold = 1.0 / (1.0 + math.exp(-logit - 1))
        // edges sorted ascending by score; drop below threshold, at least 2
        // (max(cut_point, 2), clustering.py:87-88)
        val sorted = comp.sortBy(e => (e.score, e.a, e.b))
        val cut = {
          val c = sorted.indexWhere(_.score >= threshold)
          if (c < 0) sorted.size else c
        }
        val filtered = sorted.drop(math.max(cut, 2))
        refilteredComponents(filtered, maxComponents)
      }
    }

  /** Whole-graph reference clustering — semantics of `cluster`
    * (`clustering.py:213-255`) including the component refilter. */
  def cluster[A](edges: Seq[Edge[A]], threshold: Double, maxComponents: Int = 30000)(
      implicit ord: Ordering[A]): Seq[ClusterOut[A]] =
    refilteredComponents(edges, maxComponents).flatMap(clusterComponent(_, threshold))

  /** Singleton completion (`api.py:209-218`): every id in `allIds` not in a
    * cluster becomes its own cluster with confidence 1.0. */
  def addSingletons[A](allIds: Seq[A], clusters: Seq[ClusterOut[A]]): Seq[ClusterOut[A]] = {
    val seen = clusters.flatMap(_.members).toSet
    clusters ++ allIds.filterNot(seen).map(id => ClusterOut(Vector(id), Vector(1.0)))
  }

  /** Greedy one-to-one matching (`clustering.py:284-296`): descending score,
    * take a pair iff both sides unseen. Ties broken by input order after a
    * stable sort, matching numpy `sort(order="score")` + reverse. */
  def greedyMatching[A](edges: Seq[Edge[A]]): Seq[Edge[A]] = {
    val seenA = mutable.Set.empty[A]; val seenB = mutable.Set.empty[A]
    val out = mutable.ArrayBuffer.empty[Edge[A]]
    // numpy stable-sorts ascending then reverses => descending score,
    // later input index first within ties
    edges.zipWithIndex
      .sortBy { case (e, i) => (-e.score, -i) }
      .foreach { case (e, _) =>
        if (!seenA(e.a) && !seenB(e.b)) { seenA += e.a; seenB += e.b; out += e }
      }
    out.toSeq
  }

  /** Gazetteer matching (`clustering.py:299-311`): per block, filter
    * score > threshold, descending score, take top n (n=0 -> all). */
  def gazetteMatching[A](blocks: Seq[Seq[Edge[A]]], threshold: Double = 0.0,
                         nMatches: Int = 1): Seq[Seq[Edge[A]]] =
    blocks.flatMap { block =>
      val kept = block.zipWithIndex.filter(_._1.score > threshold)
        .sortBy { case (e, i) => (-e.score, -i) }.map(_._1)
      val top = if (nMatches > 0) kept.take(nMatches) else kept
      if (top.nonEmpty) Some(top) else None
    }
}
