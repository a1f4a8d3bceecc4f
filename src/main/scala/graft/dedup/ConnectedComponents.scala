package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed connected components over a scored edge list — the cluster-
 * native replacement for the reference's in-memory union-find
 * (`clustering.py:97-170`), plus the oversized-component score refilter
 * (`clustering.py:60-94`) reproduced exactly.
 *
 * Algorithm: iterative min-label propagation with pointer jumping.
 * Each round:
 *   1. label(v) <- min(label(v), min over neighbors u of label(u))
 *      — a groupBy-min (map-side combinable, so high-degree nodes cost one
 *      partial aggregate per partition, the "large-component salting"
 *      equivalent: the shuffle only carries one candidate min per
 *      (partition, node));
 *   2. pointer jumping: label(v) <- label(label(v)) — doubles compression,
 *      giving O(log diameter) convergence overall;
 *   3. checkpoint to truncate lineage (each round is also a resumable
 *      checkpoint boundary in [[Pipeline]]) — RELIABLE when the session has
 *      a checkpoint dir (cluster), executor-local otherwise (sandbox).
 * Convergence = zero labels changed (exact count, not a heuristic).
 *
 * Labels are the lexicographically smallest member id, which makes component
 * ids deterministic under any parallelism (north-rule determinism).
 */
object ConnectedComponents {
  /** Lineage truncation for loop iterates: a RELIABLE checkpoint when the
    * session has a checkpoint dir configured (cluster jobs set one — local
    * checkpoint blocks die with their executor, so at 1000 executors any
    * loss forces a recompute from nothing), else an executor-local
    * checkpoint (the single-JVM sandbox default).
    *
    * Reliable-path cost note: Spark writes ReliableRDDCheckpointData by
    * re-running the RDD in a SEPARATE job after the materializing action,
    * so an unpersisted iterate would compute its whole plan twice per round.
    * The iterate is therefore persisted first — the checkpoint writer then
    * reads the cached blocks — and the cache is released via [[release]]
    * once the files are down. Checkpoint files of superseded rounds are
    * reclaimed by the ContextCleaner when the RDD is GC'd PROVIDED
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default
    * false): cluster submit scripts for long sessions should set it, or
    * clean the checkpoint dir between runs. */
  private def truncate(df: DataFrame, eager: Boolean): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      val cp = df.checkpoint(eager)
      if (eager) df.unpersist(blocking = false) // files written; cache done
      cp
    } else df.localCheckpoint(eager)

  /** Release a lazily-truncated iterate's pre-checkpoint cache — call after
    * the first action on the checkpointed frame has run (which is when the
    * reliable checkpoint files get written). No-op on the local path (the
    * input was never registered with the CacheManager there). */
  private def release(df: DataFrame): Unit =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.unpersist(blocking = false)


  private lazy val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Edge-count gate for the driver-local fast path: below it the whole
    * component problem fits the driver comfortably (2M edges ~ 128 MB) and a
    * local union-find beats ~6 distributed join rounds by an order of
    * magnitude — the same small-input adaptivity AQE applies to joins. At
    * 10^12-doc scale the scored edge list is orders of magnitude above the
    * gate and the distributed loop runs. */
  val LocalEdgeThreshold: Long = 2000000L

  /** Driver-local union-find with the SAME label semantics as the
    * distributed loop (comp = smallest member id, so outputs are
    * bit-identical whichever path runs). Schema-preserving. */
  private def runLocal(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val rows = edges.select(col("a"), col("b")).collect()
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    rows.foreach { r =>
      val a = r.get(0); val b = r.get(1)
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent.put(ra, rb)
    }
    import scala.jdk.CollectionConverters._
    def lt(x: Any, y: Any): Boolean = x.asInstanceOf[Comparable[Any]].compareTo(y) < 0
    val minOf = new java.util.HashMap[Any, Any]()
    parent.keySet().asScala.foreach { id =>
      val r = find(id)
      val cur = minOf.get(r)
      if (cur == null || lt(id, cur)) minOf.put(r, id)
    }
    val out = parent.keySet().asScala.toSeq
      .map(id => org.apache.spark.sql.Row(id, minOf.get(find(id))))
    val dt = edges.schema.head.dataType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", dt),
      org.apache.spark.sql.types.StructField("comp", dt)))
    spark.createDataFrame(out.asJava, schema)
  }

  /** @param edges (a, b) ids; returns (id, comp) for every endpoint.
    * `localEdgeThreshold` selects the driver-local fast path (same labels);
    * pass 0 to force the distributed loop. */
  def run(edges: DataFrame, maxIterations: Int = 50,
          localEdgeThreshold: Long = LocalEdgeThreshold): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // symmetrized adjacency, deduped, then hash-partitioned ONCE on the
    // per-iteration join key: every iteration's neighbor-min join reuses
    // this partitioning, so only the (small) label table moves per round
    val sym = edges.select($"a".as("src"), $"b".as("dst"))
      .unionAll(edges.select($"b".as("src"), $"a".as("dst")))
      .distinct()
      .repartition($"dst")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Iterative micro-queries pay AQE's per-stage scheduling latency (~4
    // stages x ~10 rounds) without gaining anything — partition counts are
    // fixed and the per-round tables are label-sized. Disable AQE for the
    // loop and restore after. The shuffle_hash hints below keep the joins
    // off the driver (no per-round broadcast rebuild) at any label size.
    // Shuffle partitions for the loop are DATA-proportional (label tables,
    // ~100k rows/partition), not cluster-width-proportional: a 1000-executor
    // session would otherwise run every ~600k-row round in 200k empty tasks.
    val nEdges = edges.count()
    if (nEdges <= localEdgeThreshold) { sym.unpersist(); return runLocal(edges) }
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val partsWas = spark.conf.get("spark.sql.shuffle.partitions")
    val loopParts = math.max(8L, math.min(partsWas.toLong, nEdges / 100000L + 1L))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", loopParts)
    try {

    // convergence via a multiset checksum of (id, comp) — one narrow agg per
    // iteration instead of a join; collision probability ~2^-64.
    // Decimal accumulator: exact + overflow-free under ANSI mode. The agg is
    // the ONLY action per iteration: it also materializes the lazy
    // localCheckpoint, so each round costs a single Spark job.
    def checksum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(xxhash64($"id", $"comp").cast("decimal(38,0)"))).head().getDecimal(0)

    val assign0 = sym.select($"src".as("id")).distinct()
      .withColumn("comp", $"id")
    var assign = truncate(assign0, eager = false)
    var prevSum = checksum(assign) // also materializes the checkpoint
    release(assign0)
    if (prevSum == null) { sym.unpersist(); return assign } // empty edge set

    var iter = 0
    var changed = true
    while (changed && iter < maxIterations) {
      // neighbor minimum (partial agg combines map-side); only `assign`
      // shuffles — sym is already partitioned on dst
      val nbrMin = sym
        .join(assign.hint("shuffle_hash").withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy($"src")
        .agg(min($"comp").as("nmin"))
        .withColumnRenamed("src", "id")

      val stepped = assign
        .join(nbrMin.hint("shuffle_hash"), Seq("id"), "left")
        .select($"id", least($"comp", coalesce($"nmin", $"comp")).as("comp"))

      // pointer jumping: comp <- comp(comp)
      val jumpTargets = stepped.select($"id".as("jid"), $"comp".as("jcomp"))
      val next0 = stepped
        .join(jumpTargets.hint("shuffle_hash"), stepped("comp") === jumpTargets("jid"), "left")
        .select(stepped("id"), coalesce($"jcomp", stepped("comp")).as("comp"))
      val next = truncate(next0, eager = false) // materialized by the checksum action below

      val nextSum = checksum(next)
      release(next0)
      changed = nextSum != prevSum
      prevSum = nextSum
      assign = next
      iter += 1
    }
    if (changed)
      logger.warn(s"connected components did NOT converge within $maxIterations " +
        "iterations; returning possibly non-converged labels")
    sym.unpersist()
    assign
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.conf.set("spark.sql.shuffle.partitions", partsWas)
    }
  }

  /** Driver-local whole-refilter fast path: [[graft.cluster.LocalClustering
    * .refilteredComponents]] carries the exact reference semantics
    * (golden-tested), and below the edge gate one collect + one in-JVM pass
    * beats ~10 small distributed jobs per round. Labels = min member id,
    * identical to the distributed path. */
  private def localRefilter(scored: DataFrame, maxComponents: Int): DataFrame = {
    import graft.cluster.LocalClustering
    val spark = scored.sparkSession
    val schema = scored.schema
    val scoreIsFloat = schema("score").dataType ==
      org.apache.spark.sql.types.FloatType
    val edges = scored.select(col("a"), col("b"), col("score")).collect().map { r =>
      LocalClustering.Edge[Any](r.get(0), r.get(1),
        r.get(2).asInstanceOf[Number].doubleValue())
    }.toSeq
    implicit val anyOrd: Ordering[Any] = new Ordering[Any] {
      def compare(x: Any, y: Any): Int = x.asInstanceOf[Comparable[Any]].compareTo(y)
    }
    val comps = LocalClustering.refilteredComponents[Any](edges, maxComponents)
    val rows = comps.flatMap { comp =>
      val label = comp.iterator.flatMap(e => Iterator(e.a, e.b)).min
      comp.map { e =>
        org.apache.spark.sql.Row(e.a, e.b,
          if (scoreIsFloat) e.score.toFloat else (e.score: Any), label)
      }
    }
    val outSchema = org.apache.spark.sql.types.StructType(
      schema.fields.take(3) :+
        org.apache.spark.sql.types.StructField("comp", schema.head.dataType))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, outSchema)
  }

  /**
   * `_connected_components` semantics (`clustering.py:51-94`): components
   * with more than `maxComponents` distinct nodes are re-thresholded at
   * sigmoid(logit(min_score) + 1), dropping at least their 2 lowest-score
   * edges, then re-split — repeated until every component fits.
   *
   * @param scored (a, b, score)
   * @return (a, b, score, comp)
   */
  def withRefilter(scored: DataFrame, maxComponents: Int,
                   localEdgeThreshold: Long = LocalEdgeThreshold): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._

    var done: Option[DataFrame] = None
    var pending = truncate(scored, eager = true)
    if (pending.count() <= localEdgeThreshold)
      return localRefilter(pending, maxComponents)
    var rounds = 0
    while (pending != null && rounds < 20) {
      val assign = run(pending)
      val labeled = pending
        .join(assign.withColumnRenamed("id", "a").withColumnRenamed("comp", "comp"), Seq("a"))
        .select($"a", $"b", $"score", $"comp")

      val nodeCounts = assign.groupBy($"comp").agg(count(lit(1)).as("n_nodes"))
      // fast path (one small agg): no component exceeds the cap in the
      // overwhelmingly common case — skip the anti/semi-join machinery
      val maxNodes = Option(nodeCounts.agg(max($"n_nodes")).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L) // null on an empty edge set
      if (maxNodes <= maxComponents) {
        done = Some(done.map(_.unionByName(labeled)).getOrElse(labeled))
        pending = null
      } else {
        val oversized = nodeCounts.filter($"n_nodes" > maxComponents).select($"comp")
        val fits = labeled.join(broadcast(oversized), Seq("comp"), "left_anti").select($"a", $"b", $"score", $"comp")
        done = Some(done.map(_.unionByName(fits)).getOrElse(fits)).map(truncate(_, eager = true))
        val over = labeled.join(broadcast(oversized), Seq("comp"), "left_semi")
        // Per oversized component: threshold = sigmoid(logit(min_score)+1);
        // drop edges below it, but at least the 2 lowest (clustering.py:87-88).
        // All per-comp statistics come from map-side-combinable groupBy aggs
        // — NEVER a whole-component window, which would pull every edge of
        // the (by definition oversized) component into a single task.
        val thrPerComp = over.groupBy($"comp")
          .agg(min($"score").as("min_score"))
          .select($"comp",
            (lit(1.0) / (lit(1.0) +
              exp(-(log($"min_score") - log(lit(1.0) - $"min_score")) - lit(1.0)))).as("thr"))
        // oversized comps are few (bounded by nEdges/maxComponents):
        // broadcast their 16-byte stats rows
        val withThr = over.join(broadcast(thrPerComp), Seq("comp"))
        val belowPerComp = withThr.groupBy($"comp")
          .agg(sum(when($"score" < $"thr", 1L).otherwise(0L)).as("below"))

        // below >= 2: the `max(below, 2)` lowest-ranked edges are exactly
        // the `score < thr` set (rank is by score asc) -> pure filter.
        val manyBelow = belowPerComp.filter($"below" >= 2).select($"comp")
        val keptByThr = withThr
          .join(broadcast(manyBelow), Seq("comp"), "left_semi")
          .filter($"score" >= $"thr")
          .select($"a", $"b", $"score")

        // below < 2: drop exactly the 2 lowest by (score, a, b) — two
        // bounded min(struct) aggregates instead of a rank window.
        val fewBelow = belowPerComp.filter($"below" < 2).select($"comp")
        val sub = withThr.join(broadcast(fewBelow), Seq("comp"), "left_semi")
          .select($"comp", $"a", $"b", $"score")
        val low1 = sub.groupBy($"comp")
          .agg(min(struct($"score", $"a", $"b")).as("m1"))
        val sansLow1 = sub.join(broadcast(low1), Seq("comp"))
          .filter(struct($"score", $"a", $"b") =!= $"m1")
        val low2 = sansLow1.groupBy($"comp")
          .agg(min(struct($"score", $"a", $"b")).as("m2"))
        val keptByRank = sansLow1.join(broadcast(low2), Seq("comp"))
          .filter(struct($"score", $"a", $"b") =!= $"m2")
          .select($"a", $"b", $"score")

        pending = truncate(keptByThr.unionAll(keptByRank), eager = true)
        if (pending.isEmpty) pending = null
      }
      rounds += 1
    }
    if (pending != null) {
      val dropped = pending.count()
      logger.warn(s"oversized-component refilter exhausted $rounds rounds with " +
        s"$dropped edges still pending; those edges are dropped (their nodes " +
        "resurface as singletons downstream)")
    }
    done.get
  }
}
