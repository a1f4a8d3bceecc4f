package graft.learn

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Distributed coverage tables for the blocking learner — the engine's
 * realization of `BlockLearner.cover` and `DedupeBlockLearner.coveredPairs`
 * (`training.py:97-129`, `training.py:156-185`).
 *
 * Spark-first shape: coverage is built as long-format DataFrames
 * (predicate, pair) / (predicate, block, record) — one flatMap over the
 * labeled pairs / sampled records applying the pure predicate kernels,
 * followed by relational aggregation. Nothing quadratic ever materializes
 * outside a (predicate, block) bucket, and bucket membership is bounded by
 * the reference's own sampling cap (`labeler.py:229-233`
 * N_SAMPLED_RECORDS = 5000): the set-cover SEARCH then runs driver-side on
 * the collected match-cover sets, exactly where the reference runs it.
 */
object Cover {

  /**
   * Match cover rows — which labeled match pairs each predicate covers
   * (`training.py:97-123` `cover`: predicate(r1) ∩ predicate(r2) ≠ ∅).
   *
   * @param pairs (pair_id: long, f1: string, f2: string) labeled match
   *              pairs, pair_id = the index `i` of the reference's cover
   * @return (predicate: string, pair_id: long)
   */
  def matchCover(pairs: DataFrame, preds: Seq[NamedPredicate]): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col("pair_id").cast("long"), col("f1"), col("f2"))
      .as[(Long, String, String)]
      .flatMap { case (i, f1, f2) =>
        preds.iterator.collect {
          case p if {
            val k2 = p(f2)
            k2.nonEmpty && p(f1).exists(k2.contains)
          } => (p.name, i)
        }
      }
      .toDF("predicate", "pair_id")
  }

  /**
   * Block rows over the sampled records: every (predicate, block key,
   * record) assignment — the long-format `pred_cover` of
   * `DedupeBlockLearner.coveredPairs` (`training.py:160-170`).
   *
   * @param records (rid: long, f: string)
   * @return (predicate, block, rid)
   */
  def blockRows(records: DataFrame, preds: Seq[NamedPredicate]): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records.select(col("rid").cast("long"), col("f"))
      .as[(Long, String)]
      .flatMap { case (rid, f) =>
        preds.iterator.flatMap(p => p(f).iterator.map(b => (p.name, b, rid)))
      }
      .toDF("predicate", "block", "rid")
  }

  /**
   * Per-predicate count of distinct record pairs co-blocked over the
   * sampled records — `len(comparison_cover[predicate])`, the cost each
   * predicate carries into the set-cover search (`training.py:263`
   * `cover_count`). Mirrors `coveredPairs` (`training.py:156-185`):
   * a predicate is dropped when its largest block covers ALL sampled
   * records (`max_cover == n_records`, `training.py:171-173` — a
   * constant-key predicate blocks everything with everything), and the
   * pair set is distinct ACROSS blocks before counting.
   *
   * The pair enumeration runs inside (predicate, block) buckets as a
   * codegen equi-self-join, the same shape as
   * [[graft.dedup.Blocking.candidatePairs]]; only per-predicate counts
   * leave the cluster — the pair sets themselves never reach the driver.
   *
   * @return (predicate: string, cover_count: long)
   */
  def comparisonCoverCounts(records: DataFrame, preds: Seq[NamedPredicate],
                            nRecords: Long): DataFrame =
    comparisonCoverPairs(records, preds, nRecords)
      .groupBy(col("predicate"))
      .agg(count(lit(1)).as("cover_count"))

  // --- multi-field variants (the DataModel surface, datamodel.py:100-106:
  // --- predicates from EVERY variable feed one learner) -------------------

  /** [[matchCover]] over multi-field labeled pairs: `pairs` carries
    * `pair_id` plus `<field>_1` / `<field>_2` columns for every field the
    * predicates reference. Fields ship as one array per side (nulls
    * preserved — `NamedPredicate` maps them to no keys, the falsy-column
    * rule). */
  def matchCoverMulti(pairs: DataFrame, preds: Seq[(String, NamedPredicate)]): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val fields = preds.map(_._1).distinct
    val fi = fields.zipWithIndex.toMap
    val ps = preds.map { case (f, p) => (fi(f), p) }
    pairs.select(col("pair_id").cast("long"),
      array(fields.map(f => col(s"${f}_1")): _*).as("fs1"),
      array(fields.map(f => col(s"${f}_2")): _*).as("fs2"))
      .as[(Long, Seq[String], Seq[String])]
      .flatMap { case (i, f1, f2) =>
        ps.iterator.collect {
          case (fx, p) if {
            val k2 = p(f2(fx))
            k2.nonEmpty && p(f1(fx)).exists(k2.contains)
          } => (p.name, i)
        }
      }
      .toDF("predicate", "pair_id")
  }

  /** [[blockRows]] over multi-field records: `records` carries `rid` plus
    * one column per referenced field. */
  def blockRowsMulti(records: DataFrame, preds: Seq[(String, NamedPredicate)]): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    val fields = preds.map(_._1).distinct
    val fi = fields.zipWithIndex.toMap
    val ps = preds.map { case (f, p) => (fi(f), p) }
    records.select(col("rid").cast("long"),
      array(fields.map(col): _*).as("fs"))
      .as[(Long, Seq[String])]
      .flatMap { case (rid, fs) =>
        ps.iterator.flatMap { case (fx, p) =>
          p(fs(fx)).iterator.map(b => (p.name, b, rid))
        }
      }
      .toDF("predicate", "block", "rid")
  }

  /** [[comparisonCoverPairs]] over multi-field records. */
  def comparisonCoverPairsMulti(records: DataFrame, preds: Seq[(String, NamedPredicate)],
                                nRecords: Long): DataFrame =
    coverPairsFromBlockRows(blockRowsMulti(records, preds), nRecords)

  /** The distinct covered pairs themselves, (predicate, a, b) — the
    * long-format `comparison_cover` sets. [[comparisonCoverCounts]] is its
    * count; [[weightedPairSample]] consumes the full frame (it never leaves
    * the cluster). */
  def comparisonCoverPairs(records: DataFrame, preds: Seq[NamedPredicate],
                           nRecords: Long): DataFrame =
    coverPairsFromBlockRows(blockRows(records, preds), nRecords)

  private def coverPairsFromBlockRows(br: DataFrame, nRecords: Long): DataFrame = {
    val blockSizes = br.groupBy(col("predicate"), col("block"))
      .agg(count(lit(1)).as("sz"))
    val eligible = blockSizes.groupBy(col("predicate"))
      .agg(max(col("sz")).as("max_cover"))
      .filter(col("max_cover") < nRecords)
      .select(col("predicate"))
    val kept = br.join(broadcast(eligible), Seq("predicate"))
    kept.as("x")
      .join(kept.as("y"),
        col("x.predicate") === col("y.predicate") &&
          col("x.block") === col("y.block") && col("x.rid") < col("y.rid"))
      .select(col("x.predicate").as("predicate"),
        col("x.rid").as("a"), col("y.rid").as("b"))
      .distinct()
  }

  /**
   * Predicate-vote-weighted candidate sampling — the deterministic batch
   * analogue of `BlockLearner._sample_indices` (`labeler.py:170-203`): each
   * predicate votes for every pair it covers with strength inversely
   * proportional to how many pairs it covers (rare predicates' votes are
   * worth more), predicates covering `maxCover`+ pairs abstain, and the
   * reference's weighted RNG draw becomes a top-`sampleSize` by weight
   * (ties on pair id). Votes are integer-quantized (1e9 / cover_count) so
   * the sum is exact under any partition order.
   *
   * @param maxCover vote-eligibility ceiling — the reference passes the
   *                 all-pairs count n(n-1)/2
   * @return (a, b, weight_q) the sampled candidate pairs
   */
  def weightedPairSample(records: DataFrame, preds: Seq[NamedPredicate],
                         nRecords: Long, sampleSize: Int,
                         maxCover: Long): DataFrame = {
    val pairs = comparisonCoverPairs(records, preds, nRecords)
    val counts = pairs.groupBy(col("predicate"))
      .agg(count(lit(1)).as("cover_count"))
      .filter(col("cover_count") < maxCover)
    pairs.join(broadcast(counts), Seq("predicate"))
      .groupBy(col("a"), col("b"))
      .agg(sum(expr("1000000000 div cover_count")).as("weight_q"))
      .orderBy(col("weight_q").desc, col("a").asc, col("b").asc)
      .limit(sampleSize)
  }

  /**
   * Two-sided (record-link) comparison-cover counts —
   * `RecordLinkBlockLearner.coveredPairs` (`training.py:231-266`): blocks
   * are keyed from BOTH sides' key emissions, a covered pair is any
   * (left record, right record) sharing a block, and a predicate is
   * dropped when ANY of its blocks covers all records of both sides
   * (`training.py:252-258` — the constant-key degenerate). Reference
   * nuance preserved: only blocks present on the RIGHT (indexed) side
   * count — the left pass intersects `blocks & current_blocks`
   * (`training.py:243-246`) — which the inner join realizes.
   *
   * @param left  (rid, f) sampled records of side 1
   * @param right (rid, f) sampled records of side 2
   * @return (predicate, cover_count) distinct cross-side pairs per predicate
   */
  def comparisonCoverCountsLink(left: DataFrame, right: DataFrame,
                                preds: Seq[NamedPredicate],
                                nLeft: Long, nRight: Long): DataFrame =
    linkCoverCountsFromBlockRows(blockRows(left, preds), blockRows(right, preds),
      nLeft, nRight)

  /** Multi-field [[comparisonCoverCountsLink]] (the `RecordLink(variables)`
    * surface): both sides carry `rid` + field columns. */
  def comparisonCoverCountsLinkMulti(left: DataFrame, right: DataFrame,
                                     preds: Seq[(String, NamedPredicate)],
                                     nLeft: Long, nRight: Long): DataFrame =
    linkCoverCountsFromBlockRows(blockRowsMulti(left, preds),
      blockRowsMulti(right, preds), nLeft, nRight)

  private def linkCoverCountsFromBlockRows(bl: DataFrame, br: DataFrame,
                                           nLeft: Long, nRight: Long): DataFrame = {
    val sizes = bl.groupBy(col("predicate"), col("block"))
      .agg(countDistinct(col("rid")).as("n_a"))
      .join(br.groupBy(col("predicate"), col("block"))
        .agg(countDistinct(col("rid")).as("n_b")), Seq("predicate", "block"))
    val degenerate = sizes
      .filter(col("n_a") === nLeft && col("n_b") === nRight)
      .select(col("predicate")).distinct()
    val keptL = bl.join(broadcast(degenerate), Seq("predicate"), "left_anti")
    keptL.as("x")
      .join(br.as("y"),
        col("x.predicate") === col("y.predicate") && col("x.block") === col("y.block"))
      .select(col("x.predicate").as("predicate"),
        col("x.rid").as("a"), col("y.rid").as("b"))
      .distinct()
      .groupBy(col("predicate"))
      .agg(count(lit(1)).as("cover_count"))
  }

  /** Deterministic record sampling to the reference's cap
    * (`labeler.py:229-233` N_SAMPLED_RECORDS): the reference random-samples
    * (`labeler.py:491-496`); here the top `cap` records by a seeded
    * xxhash64 of the rid — deterministic under any parallelism (the
    * engine's reproducibility rules) yet UNBIASED like the reference's
    * uniform draw (rid order can correlate with content — e.g. crawl
    * order — and "first cap by rid" would inherit that bias). */
  def sampleRecords(records: DataFrame, cap: Int, seed: Long = 42L): DataFrame =
    records.orderBy(xxhash64(col("rid"), lit(seed)), col("rid")).limit(cap)

  /** Collect a (predicate, pair_id) match-cover frame into predicate →
    * covered-index sets, ordered by `preds` declaration order (Python dict
    * insertion order — the learner's tie-breaks depend on it). */
  private[learn] def collectMatchCover(mc: DataFrame, preds: Seq[NamedPredicate])
      : Vector[(String, Set[Int])] = {
    val rows = mc.collect()
      .map(r => (r.getString(0), r.getLong(1).toInt))
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    preds.iterator.map(_.name).flatMap(n => rows.get(n).map(n -> _)).toVector
  }
}
