package graft.learn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.DedupConfig

/**
 * The active-labeling session — `Dedupe.uncertain_pairs` / `mark_pairs` /
 * `train` (`api.py:1235-1313`) as a stateful facade over the engine's
 * deterministic pieces: [[Disagreement.topK]] plays
 * `DisagreementLearner.pop`, [[TrainedDedupe.train]] plays retrain.
 *
 * Label state lives driver-side exactly like the reference's
 * `training_pairs` dict (a human labels at most thousands of pairs); the
 * candidate POOL, scoring and coverage stay distributed. Every step is a
 * pure function of (records, pool, labels so far), so a transcript replays
 * bit-identically — the determinism the engine's rules require and the
 * reference's RNG-driven sampler lacks.
 *
 * @param records (rid: long, f: string) the corpus (or its sample)
 * @param pool    (id_a, id_b) candidate pairs offered for labeling — the
 *                role of the reference's up-front sampled pair pool
 *                (`labeler.py:491-496`); build it from
 *                [[Cover.weightedPairSample]] or any deterministic source
 */
final class ActiveLearner(records: DataFrame, pool: DataFrame,
                          preds: Seq[NamedPredicate] = null,
                          cfg: DedupConfig = DedupConfig(),
                          candidateTypes: String = "simple") {
  private val zoo =
    if (preds != null) preds else PredicateZoo.stringPredicates("f")
  private val spark = records.sparkSession
  import spark.implicits._

  private var labels = Vector.empty[(Long, Long, Int)] // (id_a, id_b, label)
  // pairs already handed out by uncertainPairs — the reference POPS a
  // served pair out of its candidate pool whether or not it ever gets
  // marked (`labeler.py:396-404`), so a front-end that buffers or skips a
  // pair must not be offered it again
  private var served = Set.empty[(Long, Long)]
  private var nextId = 0L

  /** `mark_pairs` (`api.py:1263-1287`): record a labeled pair. */
  def markPair(idA: Long, idB: Long, label: Int): Unit = {
    require(label == 0 || label == 1, s"label must be 0/1, got $label")
    labels :+= ((idA, idB, label))
  }

  def labeledCount: (Int, Int) =
    (labels.count(_._3 == 1), labels.count(_._3 == 0))

  /** The `DisagreementLearner` seed (`labeler.py:436-452`): an exact
    * self-match marked 4x positive plus one cross-record pair marked
    * negative, so the first `uncertainPairs` call has a trainable label
    * set before any human labels exist. Deterministic seeded-hash picks
    * stand in for the reference's `random.choice`. */
  def seed(): Unit = {
    val ids = records.select(col("rid").cast("long"))
      .orderBy(xxhash64(col("rid"), lit(20260817L))).limit(2)
      .as[Long].collect()
    require(ids.length == 2, "seed() needs at least 2 records")
    (1 to 4).foreach(_ => markPair(ids(0), ids(0), 1))
    markPair(ids(0), ids(1), 0)
  }

  /** Field values for the records a front-end is about to show
    * (`convenience.py:158-162` prints `field : value` per record). */
  def recordValues(ids: Seq[Long]): Map[Long, String] =
    records.select(col("rid").cast("long"), col("f"))
      .filter(col("rid").isin(ids: _*))
      .as[(Long, String)].collect().toMap

  /** The labeled frame in [[TrainedDedupe.train]]'s shape — field values
    * joined IN the cluster (the driver only ever holds the label ids). */
  def labeledPairs(): DataFrame = {
    require(labels.nonEmpty, "no labeled pairs yet")
    val l = labels.zipWithIndex
      .map { case ((a, b, lab), i) => (i.toLong, a, b, lab) }
      .toDF("pair_id", "ida", "idb", "label")
    l.join(records.select(col("rid").cast("long").as("ida"), col("f").as("f1")), Seq("ida"))
      .join(records.select(col("rid").cast("long").as("idb"), col("f").as("f2")), Seq("idb"))
      .select(col("pair_id"), col("f1"), col("f2"), col("label"))
  }

  /** `train` (`api.py:1170-1202`): settings from the labels so far. */
  def train(): TrainedDedupe.Settings =
    TrainedDedupe.train(labeledPairs(), records, zoo,
      candidateTypes = candidateTypes)

  /**
   * `uncertain_pairs` (`api.py:1235-1261`): the top-k most informative
   * UNLABELED pool pairs under the CURRENT model — classifier score from
   * the fitted LR, coverage from the learned blocking rules, ranked by
   * [[Disagreement.topK]]'s tier semantics.
   */
  def uncertainPairs(k: Int = 1): Seq[(Long, Long)] = {
    val settings = train()
    val active = PredicateZoo.resolve(settings.rules, zoo)
    val blocked = TrainedDedupe.blockPairsResolved(records, active, cfg)
      .select(col("a").as("id_a"), col("b").as("id_b"), lit(1).as("cov"))
    val asked = (labels.map(p => (p._1, p._2)) ++ served).distinct
      .toDF("id_a", "id_b")
    val sides = records.select(col("rid").cast("long"), col("f"))
    val cand = pool
      .join(asked, Seq("id_a", "id_b"), "left_anti")
      .join(sides.select(col("rid").as("id_a"), col("f").as("f_a")), Seq("id_a"))
      .join(sides.select(col("rid").as("id_b"), col("f").as("f_b")), Seq("id_b"))
      .join(blocked, Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"),
        LogisticRegression.scoreColumn(settings.model,
          TrainedDedupe.features(col("f_a"), col("f_b"))).as("score"),
        coalesce(col("cov"), lit(0)).as("covered"))
    val out = Disagreement.topK(cand, k)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSeq
    served ++= out
    out
  }
}
