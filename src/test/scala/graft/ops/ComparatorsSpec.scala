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
}
