package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Training-data construction from an already-deduplicated dataset — the
 * distributed `training_data_dedupe` (`convenience.py:295-351`) plus the
 * triangular-index pair decode of `randomPairs` (`convenience.py:28-57`).
 *
 * Match pairs are all within-group combinations of the common key; distinct
 * pairs are a sample of the n*(n-1)/2 unordered index pairs decoded
 * arithmetically from flat indices (never enumerating all pairs), minus the
 * match pairs. The reference samples with `random.sample`; this port samples
 * deterministically by hashing the sample ordinal (the with-replacement
 * fallback the reference itself uses past 2^63, `convenience.py:45-46`), so
 * runs are reproducible and the DuckDB oracle can replay them.
 */
object TrainingData {

  /** Decode flat upper-triangle indices `k` in [0, n(n-1)/2) into (i, j)
    * index pairs, i < j — exact integer port of `convenience.py:28-57`
    * (the i*(b+i+2) product is provably even, so truncating and flooring
    * division agree and both engines compute identical pairs; IEEE sqrt is
    * correctly rounded in both). Input df must have a `k` column. */
  def decodePairs(ks: DataFrame, nRecords: Long): DataFrame = {
    val nPairs = nRecords * (nRecords - 1) / 2
    require(nRecords < (1L << 52), "triangular decode needs exact doubles")
    val b = 1L - 2L * nRecords
    ks.select(col("k"),
      floor((lit(-b) - lit(2.0) * sqrt(lit(2.0) * (lit(nPairs) - col("k")) + lit(0.25))) / 2)
        .cast("long").as("i"))
      .select(col("i"),
        expr(s"k + (i * ($b + i + 2)) div 2 + 1").as("j"))
  }

  /** Deterministic flat-index sample of size `sampleSize` (with replacement,
    * md5-hash of the sample ordinal — portable to the SQL oracle). */
  def sampleIndices(spark: org.apache.spark.sql.SparkSession,
                    nRecords: Long, sampleSize: Int): DataFrame = {
    val nPairs = nRecords * (nRecords - 1) / 2
    spark.range(sampleSize).select(
      (conv(substring(md5(concat(lit("tp#"), col("id").cast("string"))), 1, 15), 16, 10)
        .cast("long") % nPairs).as("k"))
  }

  /** Training-file sink (`serializer.py:52-77`, `api.py:1199-1215`
    * `write_training`): one JSON document `{"match": [[a,b]...],
    * "distinct": [[a,b]...]}`. The reference stores full records; this port
    * stores record ids (records live in the input table — web-scale training
    * files must not duplicate page payloads). Training sets are capped small
    * by construction (50k in the reference), so a driver-side write is the
    * right shape. */
  def writeTrainingJson(pairs: DataFrame, path: String): Unit = {
    val spark = pairs.sparkSession
    val byLabel = pairs.select(col("label"), col("id_a").cast("string"),
      col("id_b").cast("string"))
      .collect()
      .groupBy(_.getString(0))
    // ids are serialized through Jackson, not interpolated raw: an id holding
    // a quote or backslash (urls do) must round-trip through readTrainingJson
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def jstr(s: String): String = mapper.writeValueAsString(s)
    def arr(label: String): String =
      byLabel.getOrElse(label, Array.empty)
        .map(r => s"""[${jstr(r.getString(1))},${jstr(r.getString(2))}]""")
        .sorted.mkString("[", ",", "]")
    val json = s"""{"match":${arr("match")},"distinct":${arr("distinct")}}"""
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(json.getBytes("UTF-8")); out.close()
  }

  /** Training-file source (`read_training`, `api.py:1181-1196`): parse the
    * JSON written by [[writeTrainingJson]] back to (label, id_a, id_b). */
  def readTrainingJson(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    import scala.jdk.CollectionConverters._
    val rows = Seq("match", "distinct").flatMap { label =>
      Option(root.get(label)).toSeq.flatMap(_.elements().asScala.map { pair =>
        (label, pair.get(0).asText, pair.get(1).asText)
      })
    }
    import spark.implicits._
    rows.toDF("label", "id_a", "id_b")
  }

  /** `randomPairsMatch` decode (`convenience.py:60-77`): flat indices over
    * the full A x B grid unravel as (i, j) = (k / nB, k % nB). */
  def decodeMatchPairs(ks: DataFrame, nB: Long): DataFrame =
    ks.select(expr(s"k div $nB").as("i"), expr(s"k % $nB").as("j"))

  /**
   * `training_data_link` (`convenience.py:219-278`): match pairs = cross-
   * dataset pairs sharing the common key; distinct pairs = `sampleSize`
   * decoded random (A, B) grid indices minus matches. Both record sets keep
   * their own id spaces; output ids are (id_a from A, id_b from B).
   */
  def trainingDataLink(dataA: DataFrame, dataB: DataFrame, idCol: String,
                       keyCol: String, sampleSize: Int = 500): DataFrame = {
    val spark = dataA.sparkSession
    // sorted-order dense index per side — range-partitioned rank
    // (Pipeline.denseRank), never a single-task global Window.orderBy
    val idxA = Pipeline.denseRank(dataA.select(col(idCol)), idCol, "idx")
    val idxB = Pipeline.denseRank(dataB.select(col(idCol)), idCol, "idx")
    val nA = idxA.count()
    val nB = idxB.count()

    val matched = dataA.select(col(idCol).as("id_a"), col(keyCol).as("key"))
      .join(dataB.select(col(idCol).as("id_b"), col(keyCol).as("key")), Seq("key"))
      .select(col("id_a"), col("id_b"))
      .distinct()

    val ks = spark.range(sampleSize).select(
      (conv(substring(md5(concat(lit("tl#"), col("id").cast("string"))), 1, 15), 16, 10)
        .cast("long") % (nA * nB)).as("k"))
    val decoded = decodeMatchPairs(ks, nB)
      .join(idxA.select(col("idx").as("i"), col(idCol).as("id_a")), Seq("i"))
      .join(idxB.select(col("idx").as("j"), col(idCol).as("id_b")), Seq("j"))
      .select(col("id_a"), col("id_b"))
      .distinct()

    val distinctPairs = decoded.join(matched, Seq("id_a", "id_b"), "left_anti")
    matched.select(lit("match").as("label"), col("id_a"), col("id_b"))
      .unionByName(distinctPairs.select(lit("distinct").as("label"), col("id_a"), col("id_b")))
  }

  /**
   * `training_data_dedupe` (`convenience.py:295-351`): match pairs = all
   * within-common-key combinations (ids sorted within the pair); distinct
   * pairs = `sampleSize` decoded random pairs over the doc-id-sorted record
   * list, minus match pairs.
   *
   * @param data (idCol, keyCol) record table; ids must be unique
   * @return (label: "match"|"distinct", id_a, id_b) with id_a < id_b
   */
  def trainingDataDedupe(data: DataFrame, idCol: String, keyCol: String,
                         sampleSize: Int = 500): DataFrame = {
    val spark = data.sparkSession
    val ids = data.select(col(idCol)).distinct()
    val n = ids.count()
    // index <-> id mapping in sorted-id order (the reference's
    // unique_record_ids list; sorted for determinism) via the
    // range-partitioned rank — a single-task global Window.orderBy would
    // sort EVERY distinct id on one task even though the input here is the
    // uncapped table, not the reference's 50k training sample
    val indexed = Pipeline.denseRank(ids, idCol, "idx")

    val matched = data.select(col(idCol).as("id_a"), col(keyCol).as("key"))
      .join(data.select(col(idCol).as("id_b"), col(keyCol).as("key")), Seq("key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))

    val decoded = decodePairs(sampleIndices(spark, n, sampleSize), n)
      .join(indexed.select(col("idx").as("i"), col(idCol).as("id_a")), Seq("i"))
      .join(indexed.select(col("idx").as("j"), col(idCol).as("id_b")), Seq("j"))
      .select(col("id_a"), col("id_b"))
      .distinct()

    val distinctPairs = decoded.join(matched, Seq("id_a", "id_b"), "left_anti")
    matched.select(lit("match").as("label"), col("id_a"), col("id_b"))
      .unionByName(distinctPairs.select(lit("distinct").as("label"), col("id_a"), col("id_b")))
  }
}
