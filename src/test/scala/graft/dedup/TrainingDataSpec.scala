package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Goldens for the training-data construction (convenience.py:28-57,295-351). */
class TrainingDataSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("triangular decode enumerates exactly the upper triangle (convenience.py:28-57)") {
    // n=4: flat indices 0..5 decode to the 6 ordered pairs
    val ks = (0L until 6L).toDF("k")
    val got = TrainingData.decodePairs(ks, 4)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L)))
    // larger n: every decode satisfies 0 <= i < j < n
    val n = 137L
    val all = (0L until n * (n - 1) / 2).toDF("k")
    val pairs = TrainingData.decodePairs(all, n).as[(Long, Long)].collect()
    assert(pairs.length == (n * (n - 1) / 2).toInt)
    assert(pairs.forall { case (i, j) => i >= 0 && i < j && j < n })
    assert(pairs.distinct.length == pairs.length, "decode must be a bijection")
  }

  test("training file JSON sink/source round trip (serializer.py:52-77, api.py:1181-1215)") {
    val data = Seq((1L, "g1"), (2L, "g1"), (3L, "g2"), (4L, "g2"), (5L, "g3"))
      .toDF("doc_id", "entity")
    val td = TrainingData.trainingDataDedupe(data, "doc_id", "entity", sampleSize = 10)
    val path = java.nio.file.Files.createTempDirectory("tj").toString + "/training.json"
    TrainingData.writeTrainingJson(td, path)
    val back = TrainingData.readTrainingJson(spark, path)
      .as[(String, String, String)].collect().toSet
    val orig = td.as[(String, Long, Long)].collect()
      .map(t => (t._1, t._2.toString, t._3.toString)).toSet
    assert(back == orig)
    assert(back.exists(_._1 == "match") && back.exists(_._1 == "distinct"))
  }

  test("randomPairsMatch grid decode + training_data_link (convenience.py:60-77,219-278)") {
    // full 3x4 grid decodes to every (i, j)
    val all = (0L until 12L).toDF("k")
    val got = TrainingData.decodeMatchPairs(all, 4).as[(Long, Long)].collect().toSet
    assert(got == (for { i <- 0L until 3L; j <- 0L until 4L } yield (i, j)).toSet)
    // link semantics
    val a = Seq((2L, "k1"), (4L, "k2"), (6L, "k3")).toDF("doc_id", "key")
    val b = Seq((1L, "k1"), (3L, "k1"), (5L, "k9")).toDF("doc_id", "key")
    val td = TrainingData.trainingDataLink(a, b, "doc_id", "key", sampleSize = 20)
      .as[(String, Long, Long)].collect()
    val matches = td.filter(_._1 == "match").map(t => (t._2, t._3)).toSet
    assert(matches == Set((2L, 1L), (2L, 3L)))
    val distincts = td.filter(_._1 == "distinct").map(t => (t._2, t._3)).toSet
    assert((matches & distincts).isEmpty)
    assert(distincts.forall { case (x, y) => Set(2L, 4L, 6L)(x) && Set(1L, 3L, 5L)(y) })
  }

  test("training_data_dedupe: match pairs within common key, distinct disjoint (convenience.py:295-351)") {
    val data = Seq(
      (1L, "g1"), (2L, "g1"), (3L, "g1"),
      (4L, "g2"), (5L, "g2"),
      (6L, "g3")
    ).toDF("doc_id", "entity")
    val td = TrainingData.trainingDataDedupe(data, "doc_id", "entity", sampleSize = 30)
      .as[(String, Long, Long)].collect()
    val matches = td.filter(_._1 == "match").map(t => (t._2, t._3)).toSet
    val distincts = td.filter(_._1 == "distinct").map(t => (t._2, t._3)).toSet
    assert(matches == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
    assert((matches & distincts).isEmpty, "distinct pairs must exclude matches")
    assert(distincts.nonEmpty)
    assert(distincts.forall { case (a, b) => a < b && a >= 1 && b <= 6 })
    // deterministic across runs
    val again = TrainingData.trainingDataDedupe(data, "doc_id", "entity", sampleSize = 30)
      .as[(String, Long, Long)].collect().toSet
    assert(again == td.toSet)
  }
}
