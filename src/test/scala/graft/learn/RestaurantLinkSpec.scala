package graft.learn

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The reference's RecordLink and Gazetteer benchmarks
 * (`benchmarks/canonical_matching.py`, `benchmarks/canonical_gazetteer.py`)
 * end to end: restaurant-1 (112 records) linked against restaurant-2 (752),
 * four String variables, labels from `training_data_link(..., 5000)`,
 * join at threshold 0.5 under both constraints, gazetteer search with
 * n_matches=1 — precision/recall vs the combined `unique_id` ground truth.
 */
class RestaurantLinkSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  test("link fixtures load and normalize; ground truth has 112 cross-file pairs") {
    val (d1, d2) = Restaurant.loadLink(spark)
    assert(d1.count() === 112)
    assert(d2.count() === 752)
    val truth = Restaurant.trueLinkDupes(d1, d2)
    assert(truth.count() === 112)
    // every true pair is cross-file (one rid below the offset, one above)
    assert(truth.filter(col("a") >= Restaurant.LinkRidOffset ||
      col("b") < Restaurant.LinkRidOffset).count() === 0)
  }

  test("link labels: 112 matches + deterministic distinct sample, disjoint") {
    val (d1, d2) = Restaurant.loadLink(spark)
    val labeled = Restaurant.linkLabeledPairs(d1, d2).cache()
    assert(labeled.filter(col("label") === 1).count() === 112)
    val neg = labeled.filter(col("label") === 0).count()
    assert(neg > 4000 && neg <= 5000, s"distinct sample $neg")
    assert(labeled.groupBy(col("pair_id")).count().filter(col("count") > 1).count() === 0)
    labeled.unpersist()
  }

  test("canonical matching benchmark: one-to-one join precision/recall >= 0.9") {
    val (links, settings, rep) = Restaurant.runLink(spark)
    info(s"learned predicates: ${settings.predicates.mkString(", ")}")
    info(f"one-to-one: nTrue=${rep.nTrue} nFound=${rep.nFound} " +
      f"precision=${rep.precision}%.4f recall=${rep.recall}%.4f")
    assert(rep.nTrue === 112)
    // one-to-one: no rid appears on two links
    assert(links.groupBy(col("rid_l")).count().filter(col("count") > 1).count() === 0)
    assert(links.groupBy(col("rid_r")).count().filter(col("count") > 1).count() === 0)
    assert(rep.precision >= 0.9, f"precision ${rep.precision}%.4f")
    assert(rep.recall >= 0.9, f"recall ${rep.recall}%.4f")
  }

  test("canonical matching benchmark: many-to-one variant") {
    val (links, _, rep) = Restaurant.runLink(spark, constraint = "many-to-one")
    info(f"many-to-one: nTrue=${rep.nTrue} nFound=${rep.nFound} " +
      f"precision=${rep.precision}%.4f recall=${rep.recall}%.4f")
    // each LEFT record matches at most one right record
    assert(links.groupBy(col("rid_l")).count().filter(col("count") > 1).count() === 0)
    assert(rep.precision >= 0.9, f"precision ${rep.precision}%.4f")
    assert(rep.recall >= 0.9, f"recall ${rep.recall}%.4f")
  }

  test("canonical gazetteer benchmark: search(n=1) precision/recall >= 0.9, empty-fill") {
    val (results, _, rep) = Restaurant.runGazetteer(spark)
    info(f"gazetteer: nTrue=${rep.nTrue} nFound=${rep.nFound} " +
      f"precision=${rep.precision}%.4f recall=${rep.recall}%.4f")
    // every query surfaces exactly once at n=1 (matched or empty-fill)
    assert(results.count() === 112)
    assert(results.select(col("query_rid")).distinct().count() === 112)
    assert(rep.precision >= 0.9, f"precision ${rep.precision}%.4f")
    assert(rep.recall >= 0.9, f"recall ${rep.recall}%.4f")
  }

  test("StaticRecordLink / StaticGazetteer: reloaded settings join and search identically") {
    // the api.py:400-520 Static* constructors: a settings FILE alone drives
    // join() and search() — round-trip the learned link settings and assert
    // both surfaces reproduce their output bit-for-bit
    val (d1, d2, settings) = Restaurant.trainLink(spark)
    val path = "/tmp/graft_restaurant_link_settings.json"
    TrainedDedupe.writeSettings(spark, path, settings)
    val reloaded = TrainedDedupe.readSettings(spark, path)
    assert(reloaded.toJson === settings.toJson)
    def linksOf(s: TrainedDedupe.Settings) =
      TrainedDedupe.linkFields(d1, d2, Restaurant.LinkVariables, s, 0.5, "one-to-one")
        .select(col("rid_l"), col("rid_r")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(linksOf(reloaded) === linksOf(settings))
    def searchOf(s: TrainedDedupe.Settings) =
      TrainedDedupe.searchFields(d1, d2, Restaurant.LinkVariables, s, 0.5, n = 1)
        .select(col("query_rid"), coalesce(col("match_rid"), lit(-1L)))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(searchOf(reloaded) === searchOf(settings))
  }
}
