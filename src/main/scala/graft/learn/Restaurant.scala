package graft.learn

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The reference's OWN canonical benchmark, end to end — `benchmarks/
 * benchmarks/canonical.py`: train a deduper on the restaurant dataset
 * (864 records, 112 known duplicate pairs) and measure partition
 * precision/recall against the `unique_id` ground truth exactly as
 * `common.py:51-81` (`get_true_dupes` / `Report.from_scores`).
 *
 * Data: `src/main/resources/restaurant_training.json` holds the RAW
 * csv.DictReader rows of `restaurant-nophone-training.csv` (captured by
 * `tools/gen_restaurant_fixture.py` — the csv-dialect half runs in CPython
 * once, at fixture time) plus the executed reference's `pre_process` outputs
 * for a 4320-cell normalization parity check; the engine re-normalizes the
 * raw values with [[graft.texthash.TextHash.normalizeText]]
 * (`common.py:12-19` parity, fuzz-pinned).
 *
 * Variables mirror `canonical.py:41-47`: String(name), Exact(name),
 * String(address), ShortString(cuisine, has_missing=True),
 * ShortString(city). Labels come from `training_data_dedupe(data,
 * "unique_id", 5000)` semantics (`convenience.py:295-351`): all within-key
 * match pairs plus a deterministic ~5000-pair distinct sample.
 */
object Restaurant {

  val Variables: Seq[DataModel.Variable] = Seq(
    DataModel.Variable("name", "string"),
    DataModel.Variable("name", "exact"),
    DataModel.Variable("address", "string"),
    DataModel.Variable("cuisine", "shortstring", hasMissing = true),
    DataModel.Variable("city", "shortstring"))

  val Fields: Seq[String] = Seq("name", "address", "city", "cuisine")

  /** Parsed fixture rows: (rid, raw values, reference-cleaned values). */
  private def fixtureRows(): Vector[(Long, Map[String, String], Map[String, String])] = {
    val in = getClass.getResourceAsStream("/restaurant_training.json")
    require(in != null, "restaurant_training.json resource missing")
    val root = try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
               finally in.close()
    import scala.jdk.CollectionConverters._
    (0 until root.size).map { i =>
      val row = root.get(i)
      def m(key: String): Map[String, String] =
        row.get(key).properties().asScala
          .map(e => e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText))
          .toMap
      (i.toLong, m("raw"), m("clean"))
    }.toVector
  }

  /** The executed reference's own cleaned rows (parity oracle for specs). */
  def referenceClean(): Vector[(Long, Map[String, String])] =
    fixtureRows().map { case (i, _, clean) => (i, clean) }

  /** Load the 864 restaurant records as (rid, name, address, city, cuisine,
    * unique_id), normalized by the engine's own `pre_process` port. */
  def load(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val cols = Fields :+ "unique_id"
    fixtureRows().map { case (i, raw, _) =>
      val v = cols.map(c => graft.texthash.TextHash.normalizeText(raw(c)))
      (i, v(0), v(1), v(2), v(3), v(4))
    }.toDF("rid", "name", "address", "city", "cuisine", "unique_id")
  }

  /**
   * `training_data_dedupe(data, "unique_id", trainingSize)`
   * (`convenience.py:295-351`) over the loaded records: match pairs = all
   * within-key combinations; distinct pairs = deterministic triangular-
   * index sample minus the matches. Output: (pair_id, label,
   * `<field>_1`/`<field>_2` per variable field).
   */
  def labeledPairs(records: DataFrame, trainingSize: Int = 5000): DataFrame = {
    val spark = records.sparkSession
    val n = records.count()
    val sideCols = (side: String, tag: String) =>
      col(s"$side.rid").as(s"rid_$tag") +: Fields.map(f => col(s"$side.$f").as(s"${f}_$tag"))
    val paired = (pairs: DataFrame) => pairs
      .join(records.as("ra"), col("a") === col("ra.rid"))
      .join(records.as("rb"), col("b") === col("rb.rid"))
      .select(sideCols("ra", "1") ++ sideCols("rb", "2"): _*)

    val matches = records.as("x").join(records.as("y"),
      col("x.unique_id") === col("y.unique_id") && col("x.rid") < col("y.rid"))
      .select(col("x.rid").as("a"), col("y.rid").as("b"))
    // pair ids must be stable ints for the cover sets: a*n + b is injective
    val matched = paired(matches)
      .select((col("rid_1") * n + col("rid_2")).as("pair_id"), lit(1).as("label"),
        col("*")).drop("rid_1", "rid_2")

    val sampled = graft.dedup.TrainingData.decodePairs(
      graft.dedup.TrainingData.sampleIndices(spark, n, trainingSize), n)
      .select(col("i").as("a"), col("j").as("b")).distinct()
    val distinct = paired(sampled)
      .join(matches.select(col("a").as("rid_1"), col("b").as("rid_2")),
        Seq("rid_1", "rid_2"), "left_anti") // distinct_pairs -= matched_pairs
      .select((col("rid_1") * n + col("rid_2") + lit(n * n)).as("pair_id"),
        lit(0).as("label"), col("*")).drop("rid_1", "rid_2")
    matched.unionByName(distinct)
  }

  /** `get_true_dupes` (`common.py:51-61`): only keys shared by EXACTLY two
    * records count as a true duplicate pair. */
  def trueDupes(records: DataFrame): DataFrame =
    records.groupBy(col("unique_id"))
      .agg(collect_list(col("rid")).as("rids"))
      .filter(size(col("rids")) === 2)
      .select(array_min(col("rids")).as("a"), array_max(col("rids")).as("b"))

  /** All within-cluster pairs of a partition result —
    * `canonical.py:11-17` `make_report`'s predicted_dupes. */
  def foundDupes(clusters: DataFrame): DataFrame =
    clusters.as("x").join(clusters.as("y"),
      col("x.cluster_id") === col("y.cluster_id") && col("x.rid") < col("y.rid"))
      .select(col("x.rid").as("a"), col("y.rid").as("b"))

  final case class Report(nTrue: Long, nFound: Long, precision: Double, recall: Double)

  /** `Report.from_scores` (`common.py:64-81`). */
  def report(truth: DataFrame, found: DataFrame): Report = {
    val nTrue = truth.count()
    val nFound = found.count()
    val tp = found.join(truth, Seq("a", "b")).count()
    Report(nTrue, nFound,
      if (nFound == 0) 0.0 else tp.toDouble / nFound,
      if (nTrue == 0) 0.0 else tp.toDouble / nTrue)
  }

  /** The full benchmark: train → partition(threshold 0.5) → report.
    * Returns (clusters, settings, report). */
  def run(spark: SparkSession, threshold: Double = 0.5)
      : (DataFrame, TrainedDedupe.Settings, Report) = {
    val records = load(spark)
    val labeled = labeledPairs(records)
    val settings = TrainedDedupe.trainFields(labeled, records, Variables)
    val clusters = TrainedDedupe.partitionFields(records, Variables, settings, threshold)
    (clusters, settings, report(trueDupes(records), foundDupes(clusters)))
  }
}
