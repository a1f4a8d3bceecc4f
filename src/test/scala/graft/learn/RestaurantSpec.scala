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

  test("canonical benchmark under candidate_types=random forest (the labeler's own mode)") {
    // labeler.py:140: the reference's active learner learns with
    // random-forest conjunction candidates — cross-FIELD conjunctions
    // included (CompoundPredicate is field-agnostic; BoundRule binds each
    // part to its own field at blocking time)
    val records = Restaurant.load(spark)
    val labeled = Restaurant.labeledPairs(records)
    val settings = TrainedDedupe.trainFields(labeled, records, Restaurant.Variables,
      candidateTypes = "random forest")
    info(s"rf rules: ${settings.rules.map(_.mkString(" + ")).mkString(" | ")}")
    val clusters = TrainedDedupe.partitionFields(records, Restaurant.Variables, settings)
    val rep = Restaurant.report(Restaurant.trueDupes(records),
      Restaurant.foundDupes(clusters))
    info(f"rf report: nFound=${rep.nFound} precision=${rep.precision}%.4f recall=${rep.recall}%.4f")
    assert(rep.precision >= 0.9, f"precision ${rep.precision}%.4f")
    assert(rep.recall >= 0.9, f"recall ${rep.recall}%.4f")
    // determinism holds in rf mode too
    val again = TrainedDedupe.trainFields(labeled, records, Restaurant.Variables,
      candidateTypes = "random forest")
    assert(again.toJson === settings.toJson)
  }

  test("cross-field conjunction rule blocks on the key product of BOTH fields") {
    val s = spark; import s.implicits._
    val vars = Seq(DataModel.Variable("name", "string"),
      DataModel.Variable("city", "string"))
    val zoo = DataModel.zoo(vars).map { case (f, p) => p.name -> (f, p) }.toMap
    val rule = TrainedDedupe.BoundRule(Vector(
      zoo("(firstTokenPredicate, name)"), zoo("(firstTokenPredicate, city)")))
    // same name token + same city token -> co-blocked
    val records = Seq(
      (0L, "alpha grill", "springfield east"),
      (1L, "alpha bistro", "springfield west"), // same name+city tokens -> pair
      (2L, "alpha cafe", "shelbyville"), // same name, different city -> no pair
      (3L, "omega grill", "springfield south")) // same city, different name -> no pair
      .toDF("rid", "name", "city")
    val pairs = TrainedDedupe.blockPairsFields(records, Seq(rule),
      graft.dedup.DedupConfig())
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L)),
      s"conjunction must require BOTH fields to share a key, got $pairs")
    // kernel product: ':' in the raw field is PUNCTUATION-STRIPPED by the
    // StringPredicate preprocessing before the kernel runs (so no escape
    // fires here — escaping applies to keys that still carry ':')
    assert(rule.keys(Map("name" -> "a:b c", "city" -> "x y").apply)
      === Set("ab:x"))
  }

  test("benchmark run is deterministic (settings bit-identical across runs)") {
    val records = Restaurant.load(spark)
    val labeled = Restaurant.labeledPairs(records)
    val s1 = TrainedDedupe.trainFields(labeled, records, Restaurant.Variables)
    val s2 = TrainedDedupe.trainFields(labeled, records, Restaurant.Variables)
    assert(s1.toJson === s2.toJson)
  }

  test("StaticDedupe path: reloaded settings partition identically (use_settings=True)") {
    // canonical.py:36-39: the benchmark's settings-file branch — train once,
    // StaticDedupe forever. The multi-field settings round-trip through the
    // JSON file bit-exactly and the reloaded partition is identical.
    val records = Restaurant.load(spark)
    val settings = TrainedDedupe.trainFields(
      Restaurant.labeledPairs(records), records, Restaurant.Variables)
    val path = "/tmp/graft_restaurant_settings.json"
    TrainedDedupe.writeSettings(spark, path, settings)
    val reloaded = TrainedDedupe.readSettings(spark, path)
    assert(reloaded.toJson === settings.toJson)
    val p1 = TrainedDedupe.partitionFields(records, Restaurant.Variables, settings)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p2 = TrainedDedupe.partitionFields(records, Restaurant.Variables, reloaded)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1 === p2)
  }

  test("pair-id packing guards fail loudly off-fixture (r5 verdict #3)") {
    import spark.implicits._
    def fake(n: Long, ridBase: Long = 0L) = spark.range(n)
      .select(($"id" + ridBase).as("rid"), ($"id" % 7).as("unique_id"),
        lit("n").as("name"), lit("a").as("address"),
        lit("c").as("cuisine"), lit("t").as("city"))
    val eDedupe = intercept[IllegalArgumentException] {
      Restaurant.labeledPairs(fake(40000L))
    }
    assert(eDedupe.getMessage.contains("32767"))
    val eLink = intercept[IllegalArgumentException] {
      Restaurant.linkLabeledPairs(fake(2000L), fake(10L, Restaurant.LinkRidOffset))
    }
    assert(eLink.getMessage.contains("n1 <="))
    // fixture-sized inputs still pass the guards (existing suites cover the
    // full outputs; this pins only that the requires admit the fixture range)
    Restaurant.linkLabeledPairs(
      fake(112L), fake(752L, Restaurant.LinkRidOffset), trainingSize = 5)
  }
}
