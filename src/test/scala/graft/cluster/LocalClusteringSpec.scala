package graft.cluster

import org.scalatest.funsuite.AnyFunSuite
import LocalClustering._

/** Golden clustering fixtures ported from the reference test suite
  * (`tests/test_dedupe.py:68-234`) — the cluster-equivalence gate. */
class LocalClusteringSpec extends AnyFunSuite {

  // float32 round-trip: reference scores are dtype f4 (core.py:132)
  private def f4(d: Double): Double = d.toFloat.toDouble

  private val starDupes: Seq[Edge[Int]] = Seq(
    (1, 2, 0.86), (1, 3, 0.72), (1, 4, 0.2), (1, 5, 0.6),
    (2, 3, 0.86), (2, 4, 0.2), (2, 5, 0.72), (3, 4, 0.3),
    (3, 5, 0.5), (4, 5, 0.72), (10, 11, 0.9)
  ).map { case (a, b, s) => Edge(a, b, f4(s)) }

  private def assertClusters(actual: Seq[ClusterOut[Int]],
                             expected: Seq[(Seq[Int], Seq[Double])]): Unit = {
    val act = actual.map(c => c.members -> c.confidences).sortBy(_._1.head)
    val exp = expected.sortBy(_._1.head)
    assert(act.map(_._1.toList) == exp.map(_._1.toList))
    act.zip(exp).foreach { case ((_, confA), (_, confE)) =>
      confA.zip(confE).foreach { case (a, e) =>
        assert(math.abs(a - e) <= 0.001, s"confidence $a vs golden $e")
      }
    }
  }

  test("connected components fixture (test_dedupe.py:68-95)") {
    val g = Seq(
      (1, 2, 0.1), (2, 3, 0.2), (4, 5, 0.2), (4, 6, 0.2), (7, 9, 0.2),
      (8, 9, 0.2), (10, 11, 0.2), (12, 13, 0.2), (12, 14, 0.5), (11, 12, 0.2)
    ).map { case (a, b, s) => Edge(a, b, f4(s)) }
    val comps = refilteredComponents(g, 30000)
      .map(_.map(e => (e.a, e.b)).toSet).toSet
    assert(comps == Set(
      Set((1, 2), (2, 3)),
      Set((4, 5), (4, 6)),
      Set((12, 13), (12, 14), (10, 11), (11, 12)),
      Set((7, 9), (8, 9))
    ))
  }

  test("hierarchical star network at threshold 1 (test_dedupe.py:169-171)") {
    assert(cluster(starDupes, 1.0).isEmpty)
  }

  test("hierarchical star network at threshold 0.5 (test_dedupe.py:173-180)") {
    assertClusters(
      cluster(starDupes, 0.5),
      Seq(
        Seq(1, 2, 3) -> Seq(0.778, 0.860, 0.778),
        Seq(4, 5) -> Seq(0.720, 0.720),
        Seq(10, 11) -> Seq(0.899, 0.899)
      )
    )
  }

  test("hierarchical star network at threshold 0 (test_dedupe.py:183-189)") {
    assertClusters(
      cluster(starDupes, 0.0),
      Seq(
        Seq(1, 2, 3, 4, 5) -> Seq(0.526, 0.564, 0.542, 0.320, 0.623),
        Seq(10, 11) -> Seq(0.899, 0.899)
      )
    )
  }

  test("hierarchical with string ids (test_dedupe.py:191-198)") {
    val strDupes = Seq(
      ("1", "2", 0.86), ("1", "3", 0.72), ("1", "4", 0.2), ("1", "5", 0.6),
      ("2", "3", 0.86), ("2", "4", 0.2), ("2", "5", 0.72), ("3", "4", 0.3),
      ("3", "5", 0.5), ("4", "5", 0.72)
    ).map { case (a, b, s) => Edge(a, b, f4(s)) }
    assert(cluster(strDupes, 1.0).isEmpty)
    assert(cluster(strDupes, 0.5).map(_.members.toList).toSet ==
      Set(List("1", "2", "3"), List("4", "5")))
    assert(cluster(strDupes, 0.0).map(_.members.toList).toSet ==
      Set(List("1", "2", "3", "4", "5")))
  }

  private val bipartite: Seq[Edge[Int]] = Seq(
    (1, 5, 0.1), (1, 6, 0.72), (1, 7, 0.2), (1, 8, 0.6),
    (2, 5, 0.2), (2, 6, 0.2), (2, 7, 0.72), (2, 8, 0.3),
    (3, 5, 0.24), (3, 6, 0.72), (3, 7, 0.24), (3, 8, 0.65),
    (4, 5, 0.63), (4, 6, 0.96), (4, 7, 0.23), (5, 8, 0.24)
  ).map { case (a, b, s) => Edge(a, b, s) }

  test("greedy one-to-one matching (test_dedupe.py:200-212)") {
    val got = greedyMatching(bipartite).map(e => ((e.a, e.b), e.score))
    assert(got == Seq(((4, 6), 0.96), ((2, 7), 0.72), ((3, 8), 0.65), ((1, 5), 0.1)))
  }

  test("gazetteer top-2 matching (test_dedupe.py:214-234)") {
    val blocks = bipartite.groupBy(_.a).toSeq.sortBy(_._1).map(_._2)
    val got = gazetteMatching(blocks, threshold = 0.0, nMatches = 2)
      .map(_.map(e => ((e.a, e.b), e.score)))
    assert(got == Seq(
      Seq(((1, 6), 0.72), ((1, 8), 0.6)),
      Seq(((2, 7), 0.72), ((2, 8), 0.3)),
      Seq(((3, 6), 0.72), ((3, 8), 0.65)),
      Seq(((4, 6), 0.96), ((4, 5), 0.63)),
      Seq(((5, 8), 0.24))
    ))
  }

  test("max_components refilter drops at least two lowest edges and recurses (clustering.py:60-94)") {
    // chain of 4 nodes with maxComponents=3: min score .4 -> logit+1 ->
    // threshold sigmoid(logit(.4)+1) ~ 0.644; cut drops scores < .644 but at
    // least 2 edges
    val edges = Seq(Edge(1, 2, 0.4), Edge(2, 3, 0.5), Edge(3, 4, 0.9))
    val comps = refilteredComponents(edges, 3).map(_.map(e => (e.a, e.b)).toSet)
    assert(comps == Seq(Set((3, 4))))
  }

  test("singleton completion (api.py:209-218)") {
    val clusters = Seq(ClusterOut(Vector(1, 2), Vector(0.9, 0.9)))
    val all = addSingletons(Seq(1, 2, 3, 4), clusters)
    assert(all.map(_.members.toList).toSet == Set(List(1, 2), List(3), List(4)))
    assert(all.filter(_.members.size == 1).forall(_.confidences == Vector(1.0)))
  }
}
