package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Goldens for the non-string comparators, ported from the reference's own
  * tests (`tests/test_core.py:105-152`) and the public `haversine` package's
  * documented Lyon-Paris example. */
class ComparatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("categorical dummies golden (test_core.py:118-129, categories a,b,c)") {
    val pairs = Seq(("a", "b"), ("a", "c"), ("a", "a"), ("b", "c")).toDF("x", "y")
    val cols = Comparators.categoricalDummies($"x", $"y", Seq("a", "b", "c"))
    assert(cols.length == 5)
    val got = pairs.select(cols: _*).as[(Long, Long, Long, Long, Long)].collect()
    assert(got(0) == ((0L, 0L, 1L, 0L, 0L))) // (a,b)
    assert(got(1) == ((0L, 0L, 0L, 1L, 0L))) // (a,c)
    assert(got(2) == ((0L, 0L, 0L, 0L, 0L))) // (a,a) baseline
    assert(got(3) == ((0L, 0L, 0L, 0L, 1L))) // (b,c)
  }

  test("categorical dummies golden (test_core.py:131-152, categories a,b)") {
    val pairs = Seq(("a", "b"), ("b", "b")).toDF("x", "y")
    val cols = Comparators.categoricalDummies($"x", $"y", Seq("a", "b"))
    assert(cols.length == 2)
    val got = pairs.select(cols: _*).as[(Long, Long)].collect()
    assert(got(0) == ((0L, 1L))) // (a,b)
    assert(got(1) == ((1L, 0L))) // (b,b)
  }

  test("exists dummies (exists.py:25-38)") {
    val pairs = Seq(
      (Some("x"), Some("y")), (Some("x"), None),
      (None, Some("y")), (None, None), (Some(""), Some("x"))
    ).toDF("x", "y")
    val got = pairs.select(Comparators.existsDummies($"x", $"y"): _*)
      .as[(Long, Long)].collect()
    assert(got(0) == ((1L, 0L)))
    assert(got(1) == ((0L, 1L)))
    assert(got(2) == ((0L, 1L)))
    assert(got(3) == ((0L, 0L)))
    assert(got(4) == ((0L, 1L))) // empty string is falsy, Python truthiness
  }

  test("haversine^0.5 matches the haversine package's Lyon-Paris example") {
    // haversine((45.7597, 4.8422), (48.8567, 2.3508)) = 392.2172595594006 km
    val d = Seq((45.7597, 4.8422, 48.8567, 2.3508)).toDF("lat1", "lon1", "lat2", "lon2")
      .select(Comparators.haversineSqrt($"lat1", $"lon1", $"lat2", $"lon2").as("c"))
      .as[Double].head()
    assert(math.abs(d - math.sqrt(392.2172595594006)) < 1e-9)
    // zero distance
    val z = Seq((1.0, 2.0, 1.0, 2.0)).toDF("lat1", "lon1", "lat2", "lon2")
      .select(Comparators.haversineSqrt($"lat1", $"lon1", $"lat2", $"lon2").as("c"))
      .as[Double].head()
    assert(z == 0.0)
  }

  test("price log-distance with <=0 as missing (price.py:17-24)") {
    val rows = Seq((100.0, 1000.0), (1000.0, 100.0), (0.0, 5.0), (5.0, -1.0))
      .toDF("p1", "p2")
      .select(Comparators.priceLogDiff($"p1", $"p2").as("d"))
      .as[Option[Double]].collect()
    assert(math.abs(rows(0).get - 1.0) < 1e-12)
    assert(math.abs(rows(1).get - 1.0) < 1e-12)
    assert(rows(2).isEmpty)
    assert(rows(3).isEmpty)
  }

  test("cosine TF-IDF: hand-computed 3-doc corpus (CosineTextSimilarity shape)") {
    // corpus: d1 = [a a b], d2 = [a c], d3 = [c c]
    // df: a->2, b->1, c->2; N=3; idfQ(t) = floor(1000*(ln(4/(df+1))+1))
    val docs = Seq(
      (1L, Seq("a", "a", "b")), (2L, Seq("a", "c")), (3L, Seq("c", "c")))
      .toDF("id", "terms")
    val w = Comparators.tfidfWeights(docs, "id", "terms", nDocs = 3L)
    val got = w.as[(Long, String, Long)].collect()
      .map { case (id, t, wv) => ((id, t), wv) }.toMap
    def idfQ(df: Int): Long = math.floor(1000.0 * (math.log(4.0 / (df + 1)) + 1.0)).toLong
    assert(got((1L, "a")) == 2 * idfQ(2) && got((1L, "b")) == idfQ(1))
    assert(got((2L, "a")) == idfQ(2) && got((2L, "c")) == idfQ(2))
    assert(got((3L, "c")) == 2 * idfQ(2))

    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val cos = Comparators.cosineTfidf(pairs, w, "id")
      .as[(Long, Long, Double)].collect().map(r => ((r._1, r._2), r._3)).toMap
    val (wa, wb, wc) = (idfQ(2).toDouble, idfQ(1).toDouble, idfQ(2).toDouble)
    val n1 = math.sqrt(4 * wa * wa + wb * wb); val n2 = math.sqrt(wa * wa + wc * wc)
    val n3 = math.sqrt(4 * wc * wc)
    assert(math.abs(cos((1L, 2L)) - (2 * wa * wa) / (n1 * n2)) < 1e-12)
    assert(cos((1L, 3L)) == 0.0) // no common term -> left-join zero fill
    assert(math.abs(cos((2L, 3L)) - (2 * wc * wc) / (n2 * n3)) < 1e-12)
  }

  test("cosine set semantics: 0/1 tf; unweighted = |A∩B|/sqrt(|A||B|)") {
    val docs = Seq(
      (1L, Seq("a", "a", "b")), (2L, Seq("a", "b", "c")), (3L, Seq("x")))
      .toDF("id", "terms")
    // unweighted set cosine reduces to intersection over geometric mean
    val w = Comparators.tfidfWeights(docs, "id", "terms", nDocs = 3L,
      setSemantics = true, weighted = false)
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val cos = Comparators.cosineTfidf(pairs, w, "id")
      .as[(Long, Long, Double)].collect().map(r => ((r._1, r._2), r._3)).toMap
    assert(math.abs(cos((1L, 2L)) - 2.0 / math.sqrt(2.0 * 3.0)) < 1e-12)
    assert(cos((1L, 3L)) == 0.0)
    // identical docs -> exactly 1.0, weighted or not
    val w2 = Comparators.tfidfWeights(docs, "id", "terms", nDocs = 3L, setSemantics = true)
    val self = Comparators.cosineTfidf(Seq((1L, 1L)).toDF("id_a", "id_b"), w2, "id")
      .as[(Long, Long, Double)].collect()
    assert(self.head._3 == 1.0)
  }
}
