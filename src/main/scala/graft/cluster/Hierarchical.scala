package graft.cluster

/**
 * Centroid-linkage agglomerative clustering + distance-criterion flat
 * clustering + per-record confidences — a faithful Scala port of the
 * numerical semantics the reference gets from scipy:
 *
 *  - `scipy.cluster.hierarchy.linkage(condensed, method='centroid')`
 *    (used at `clustering.py:233-235`): generic global-min agglomeration
 *    with the Lance-Williams centroid update on squared distances
 *      d²(k, i∪j) = (nᵢ d²(k,i) + nⱼ d²(k,j))/(nᵢ+nⱼ) − nᵢnⱼ d²(i,j)/(nᵢ+nⱼ)²
 *  - `fcluster(Z, t, criterion='distance')` (`clustering.py:237-239`):
 *    maximal subtrees whose max merge height (inversion-aware) is <= t
 *  - `confidences` (`clustering.py:258-281`):
 *    score_i = 1 − sqrt( Σ_j (1−φᵢⱼ)² / (N−1) ) over within-cluster pairs,
 *    with unscored pairs at distance 1 (condensed matrix init — `clustering.py:203`).
 *
 * Pure JVM, no Spark imports: runs inside `flatMapGroups` per connected
 * component (components are capped at `maxComponents` nodes upstream, the
 * invariant the reference establishes at `clustering.py:60-94`).
 */
object Hierarchical {

  /** Condensed matrix index for row i < col j over N points
    * (`clustering.py:196-199`): i*(2N-i-3)/2 + j - 1. */
  @inline def condensedIndex(i: Int, j: Int, n: Int): Int =
    i * (2 * n - i - 3) / 2 + j - 1

  /** One agglomeration step: clusters `a` and `b` (scipy node ids, leaves
    * 0..n-1, internal n..2n-2 in merge order) merged at `height`. */
  final case class Merge(a: Int, b: Int, height: Double, size: Int)

  /**
   * Centroid linkage over a condensed distance matrix (NOT squared — same
   * contract as scipy). O(n²) memory; near-O(n²) time via cached nearest
   * neighbors with lazy revalidation (Müllner's generic algorithm).
   */
  def linkageCentroid(condensed: Array[Double], n: Int): Array[Merge] = {
    require(condensed.length == n.toLong * (n - 1) / 2, s"bad condensed length for n=$n")
    if (n <= 1) return Array.empty

    // squared distances, slot-indexed (slot i reused for merged clusters)
    val d2 = new Array[Double](condensed.length)
    var x = 0
    while (x < condensed.length) { d2(x) = condensed(x) * condensed(x); x += 1 }

    val active = Array.fill(n)(true)
    val clusterId = Array.tabulate(n)(identity) // slot -> scipy node id
    val size = Array.fill(n)(1)
    val nnSlot = new Array[Int](n)
    val nnD2 = new Array[Double](n)

    @inline def dist2(i: Int, j: Int): Double =
      if (i < j) d2(condensedIndex(i, j, n)) else d2(condensedIndex(j, i, n))
    @inline def setDist2(i: Int, j: Int, v: Double): Unit =
      if (i < j) d2(condensedIndex(i, j, n)) = v else d2(condensedIndex(j, i, n)) = v

    def recomputeNN(i: Int): Unit = {
      var best = Double.MaxValue; var bestJ = -1
      var j = 0
      while (j < n) {
        if (j != i && active(j)) {
          val d = dist2(i, j)
          if (d < best) { best = d; bestJ = j }
        }
        j += 1
      }
      nnD2(i) = best; nnSlot(i) = bestJ
    }

    var i = 0
    while (i < n) { recomputeNN(i); i += 1 }

    val merges = new Array[Merge](n - 1)
    var step = 0
    var activeCount = n
    while (activeCount > 1) {
      // global minimum over cached NN entries
      var best = Double.MaxValue; var bi = -1
      var s = 0
      while (s < n) {
        if (active(s) && nnD2(s) < best) { best = nnD2(s); bi = s }
        s += 1
      }
      var a = bi; var b = nnSlot(a)
      // order by scipy node id ascending in the output row
      if (clusterId(a) > clusterId(b)) { val t = a; a = b; b = t }
      val mergedD2 = dist2(a, b)
      val na = size(a); val nb = size(b)

      merges(step) = Merge(clusterId(a), clusterId(b), math.sqrt(mergedD2), na + nb)

      // Lance-Williams centroid update into slot a
      val tot = (na + nb).toDouble
      val sub = na.toDouble * nb / (tot * tot) * mergedD2
      var k = 0
      while (k < n) {
        if (k != a && k != b && active(k)) {
          val nd = (na * dist2(a, k) + nb * dist2(b, k)) / tot - sub
          setDist2(a, k, nd)
        }
        k += 1
      }
      active(b) = false
      size(a) = na + nb
      clusterId(a) = n + step
      activeCount -= 1
      step += 1
      if (activeCount > 1) {
        recomputeNN(a)
        // revalidate stale NN caches: anything pointing at a or b, and anything
        // for which the merged cluster is now closer
        k = 0
        while (k < n) {
          if (active(k) && k != a) {
            if (nnSlot(k) == a || nnSlot(k) == b) recomputeNN(k)
            else {
              val d = dist2(a, k)
              if (d < nnD2(k)) { nnD2(k) = d; nnSlot(k) = a }
            }
          }
          k += 1
        }
      }
    }
    merges
  }

  /**
   * Flat clusters by the 'distance' criterion: labels 0..K-1, one per leaf,
   * where a flat cluster is a maximal subtree whose inversion-aware max merge
   * height <= t (scipy `get_max_dist_for_each_cluster` + `cluster_monocrit`).
   */
  def fclusterDistance(merges: Array[Merge], n: Int, t: Double): Array[Int] = {
    val labels = new Array[Int](n)
    if (n == 1) return labels
    if (merges.isEmpty) { var i = 0; while (i < n) { labels(i) = i; i += 1 }; return labels }

    val m = merges.length
    // maxDist per internal node (id n+k): max of own height and children's
    val maxDist = new Array[Double](m)
    var k = 0
    while (k < m) {
      var d = merges(k).height
      val a = merges(k).a; val b = merges(k).b
      if (a >= n) d = math.max(d, maxDist(a - n))
      if (b >= n) d = math.max(d, maxDist(b - n))
      maxDist(k) = d
      k += 1
    }

    var next = 0
    def assign(node: Int, label: Int): Unit = {
      if (node < n) labels(node) = label
      else { assign(merges(node - n).a, label); assign(merges(node - n).b, label) }
    }
    // left-first DFS from the root; cut where maxDist <= t
    def walk(node: Int): Unit = {
      if (node < n) { labels(node) = next; next += 1 }
      else if (maxDist(node - n) <= t) { assign(node, next); next += 1 }
      else { walk(merges(node - n).a); walk(merges(node - n).b) }
    }
    walk(n + m - 1)
    labels
  }

  /**
   * Per-record confidences (`clustering.py:258-281`):
   * for members (point indices into the condensed matrix) of one flat cluster,
   * score_i = 1 - sqrt( Σ_{j≠i} d²(i,j) / (|cluster|-1) ).
   * Returns scores aligned with `members.sorted`.
   */
  def confidences(members: Array[Int], condensed: Array[Double], n: Int): Array[Double] = {
    val sortedM = members.sorted
    val idx = sortedM.zipWithIndex.toMap
    val acc = new Array[Double](sortedM.length)
    var i = 0
    while (i < sortedM.length) {
      var j = i + 1
      while (j < sortedM.length) {
        val d = condensed(condensedIndex(sortedM(i), sortedM(j), n))
        val d2 = d * d
        acc(idx(sortedM(i))) += d2
        acc(idx(sortedM(j))) += d2
        j += 1
      }
      i += 1
    }
    val denom = (sortedM.length - 1).toDouble
    acc.map(a => 1.0 - math.sqrt(a / denom))
  }
}
