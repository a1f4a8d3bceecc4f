package graft.learn

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The reference's own canonical benchmark (`benchmarks/canonical.py`) run
 * end to end through the learned loop: 864 restaurant records, variables
 * String(name)+Exact(name)+String(address)+ShortString(cuisine,
 * has_missing)+ShortString(city), labels from
 * `training_data_dedupe(data, "unique_id", 5000)`, partition at threshold
 * 0.5, precision/recall vs `unique_id` per `common.py:51-81`. This is the
 * quality-parity proof the synthetic webtext corpus can't give: learned
 * predicates, affine-gap features and clustering on real messy short
 * strings.
 */
class RestaurantSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  test("normalizeText reproduces the executed reference pre_process on all 4320 cells") {
    val loaded = Restaurant.load(spark).collect()
      .map(r => r.getLong(0) -> r).toMap
    val clean = Restaurant.referenceClean()
    assert(clean.size === 864)
    var cells = 0
    clean.foreach { case (rid, want) =>
      val row = loaded(rid)
      Seq("name" -> 1, "address" -> 2, "city" -> 3, "cuisine" -> 4, "unique_id" -> 5)
        .foreach { case (f, i) =>
          cells += 1
          assert(row.getString(i) === want(f), s"rid=$rid field=$f")
        }
    }
    assert(cells === 4320)
  }

  test("ground truth: 112 true duplicate pairs (groups of exactly 2)") {
    val truth = Restaurant.trueDupes(Restaurant.load(spark))
    assert(truth.count() === 112)
  }

  test("labeled pairs: 112 matches + ~5k deterministic distinct, disjoint") {
    val records = Restaurant.load(spark)
    val labeled = Restaurant.labeledPairs(records).cache()
    val pos = labeled.filter(col("label") === 1).count()
    val neg = labeled.filter(col("label") === 0).count()
    assert(pos === 112)
    assert(neg > 4000 && neg <= 5000, s"distinct sample $neg")
    // no pair labeled both ways: ids are disjoint by construction, check keys
    val dup = labeled.groupBy(col("pair_id")).count().filter(col("count") > 1).count()
    assert(dup === 0)
    labeled.unpersist()
  }

  test("canonical benchmark: precision and recall >= 0.9 at threshold 0.5") {
    val (clusters, settings, rep) = Restaurant.run(spark)
    info(s"learned predicates: ${settings.predicates.mkString(", ")}")
    info(s"C=${settings.c} weights=${settings.model.weights.mkString(",")} " +
      s"intercept=${settings.model.intercept}")
    info(s"report: nTrue=${rep.nTrue} nFound=${rep.nFound} " +
      f"precision=${rep.precision}%.4f recall=${rep.recall}%.4f")
    assert(rep.nTrue === 112)
    assert(clusters.count() === 864) // every record assigned
    assert(rep.precision >= 0.9, f"precision ${rep.precision}%.4f")
    assert(rep.recall >= 0.9, f"recall ${rep.recall}%.4f")
    // affine-gap features are DISTANCES: the fitted model must weight the
    // name distance negatively (closer names -> higher match probability)
    assert(settings.model.weights(0) < 0.0,
      s"name affine-gap weight ${settings.model.weights(0)}")
  }

  test("benchmark run is deterministic (settings bit-identical across runs)") {
    val records = Restaurant.load(spark)
    val labeled = Restaurant.labeledPairs(records)
    val s1 = TrainedDedupe.trainFields(labeled, records, Restaurant.Variables)
    val s2 = TrainedDedupe.trainFields(labeled, records, Restaurant.Variables)
    assert(s1.toJson === s2.toJson)
  }
}
