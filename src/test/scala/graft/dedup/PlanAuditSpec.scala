package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.Queries

/** Physical-plan audit: the properties that matter at 100 TB must be visible
  * in the plan at any scale — filter pushdown to the parquet scan, column
  * pruning, whole-stage codegen over the signature expressions, broadcast of
  * the (small) hot-key side, map-side partial aggregation in CC. */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("parquet scan: filter pushed down and columns pruned (scan_docs)") {
    val plan = Queries.scanDocs(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string,n_chars:bigint>"),
      s"columns not pruned:\n$plan")
  }

  test("signature stage: single codegen span, no UDF nodes") {
    val pages = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id".cast("string").as("url"), $"text")
    val plan = Blocking.signatures(pages, DedupConfig())
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no codegen span:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF leaked into hot path:\n$plan")
    // text column IS read (needed for shingles) but html-like payloads never are
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("hot-key drop: broadcast left-anti join (never a shuffled mega-join)") {
    val pages = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id".cast("string").as("url"), $"text")
    val sigs = Blocking.signatures(pages, DedupConfig())
    val keys = Blocking.blockKeys(sigs, DedupConfig())
    val pairs = Blocking.candidatePairs(keys, 500L, DedupConfig()).pairs
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"hot-key drop is not a broadcast anti-join:\n$plan")
  }

  test("ANN queries: no cartesian product in the executed plan (bucketed LSH join)") {
    for (q <- Seq(graft.ops.PipelineOps.annTopK(spark, sf),
                  graft.ops.PipelineOps.annCosine(spark, sf))) {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"ANN plan contains an all-pairs join:\n$plan")
      // the hyperplane matrix is precomputed on the driver and inlined —
      // per-row md5 evaluation in the cell expression is a ~100x constant
      assert(!plan.toLowerCase.contains("md5"),
        s"ANN cell expression still hashes per row:\n$plan")
    }
  }

  test("ANN bucketed top-k: recall >= 0.7 vs exact brute force on sf0.001") {
    import org.apache.spark.sql.functions.{col, expr}
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select(col("vec_id"),
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 100000) as bigint))").as("q"))
    val exact = graft.ops.PipelineOps.annBruteForce(e)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = graft.ops.PipelineOps.annTopK(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"bucketed ANN recall $recall too low (${exact.size} exact)")
  }

  test("CC local fast path and distributed loop produce identical labels") {
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "r"), ("r", "a"))
      .toDF("a", "b")
    val local = ConnectedComponents.run(edges)
      .as[(String, String)].collect().toSet
    val dist = ConnectedComponents.run(edges, localEdgeThreshold = 0)
      .as[(String, String)].collect().toSet
    assert(local == dist)
    assert(local == Set(("a", "a"), ("b", "a"), ("c", "a"), ("p", "a"), ("q", "a"),
      ("r", "a"), ("x", "x"), ("y", "x")))
    // long ids too (the pipeline's nid space)
    val le = Seq((5L, 3L), (3L, 9L), (11L, 12L)).toDF("a", "b")
    val ll = ConnectedComponents.run(le).as[(Long, Long)].collect().toSet
    val ld = ConnectedComponents.run(le, localEdgeThreshold = 0).as[(Long, Long)].collect().toSet
    assert(ll == ld)
    assert(ll == Set((3L, 3L), (5L, 3L), (9L, 3L), (11L, 11L), (12L, 11L)))
  }

  test("scoring verify joins hash the shingle side — arrays are never sort-merged") {
    val pages = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id".cast("string").as("url"), $"text")
    val sigs = Blocking.signatures(pages, DedupConfig())
    val pairs = Seq(("1", "2"), ("3", "4")).toDF("a", "b")
    val plan = Scoring.scorePairs(pairs, sigs, minScore = 0.3, maxHamming = 16)
      .queryExecution.executedPlan.toString
    // the array-carrying sigs side must be hash-joined (broadcast or
    // shuffled-hash): a sort-merge join would sort KB array payloads —
    // measured 743 of 961 core-seconds of the verify stage in round 2
    assert(!plan.contains("SortMergeJoin"), s"arrays sort-merged:\n$plan")
  }

  test("refilter local fast path and distributed loop produce identical output") {
    val scored = Seq(
      ("a", "b", 0.9), ("b", "c", 0.35), ("c", "d", 0.9), ("d", "e", 0.92),
      ("x", "y", 0.8), ("p", "q", 0.55)
    ).toDF("a", "b", "score")
    val local = ConnectedComponents.withRefilter(scored, maxComponents = 3)
      .as[(String, String, Double, String)].collect().toSet
    val dist = ConnectedComponents.withRefilter(scored, maxComponents = 3,
      localEdgeThreshold = 0)
      .as[(String, String, Double, String)].collect().toSet
    assert(local == dist, s"local=$local dist=$dist")
  }

  test("r3 operators: no all-pairs joins; LCS hot-window drop is a broadcast anti-join") {
    import graft.ops.PipelineOps
    // cosine/tfidf/embed queries: candidates always come from equi-joins
    for (q <- Seq(PipelineOps.scoreCosineTfidf(spark, sf),
                  PipelineOps.tfidfSearch(spark, sf),
                  PipelineOps.dedupEmbedCosine(spark, sf),
                  PipelineOps.scoreLcsSuffix(spark, sf))) {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"all-pairs join leaked into the plan:\n$plan")
    }
    // the LCS stop-word drop must be the broadcast anti-join shape
    val lcs = PipelineOps.scoreLcsSuffix(spark, sf).queryExecution.executedPlan.toString
    assert(lcs.contains("BroadcastHashJoin") && lcs.contains("LeftAnti"),
      s"LCS hot-window drop is not a broadcast anti-join:\n$lcs")
    // r5: diagonal runs are ONE aggregation (sorted-points HOF walk) — a
    // window + two groupBys would cost two more shuffles for the same answer
    assert(!lcs.contains("Window"),
      s"LCS run computation regressed to a window operator:\n$lcs")
  }

  test("scoreLcs co-blocking (r5): bounded suffix self-join, no all-pairs, hot drop is anti-join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id".cast("string").as("url"),
        graft.expr.functions.normalize_text($"text").as("text"))
    val sigs = Blocking.signatures(docs, DedupConfig())
    val noPairs = Seq.empty[(String, String)].toDF("a", "b")
    val q = Scoring.scorePairs(noPairs, sigs, minScore = 0.3, maxHamming = 16,
      scoreLcs = true)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join leaked into the LCS co-blocking plan:\n${plan.take(4000)}")
    assert(plan.contains("LeftAnti"),
      s"suffix hot-key drop missing from the co-blocking plan:\n${plan.take(4000)}")
  }

  test("CC distributed loop uses reliable checkpoints when a checkpoint dir is set") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val cachedBefore = spark.sparkContext.getPersistentRDDs.size
      val edges = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("a", "b")
      val labels = ConnectedComponents.run(edges, localEdgeThreshold = 0)
        .as[(String, String)].collect().toSet
      assert(labels == Set(("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")))
      // the reliable path actually wrote RDD checkpoints into the dir
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      val entries = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      assert(entries.nonEmpty, "no reliable checkpoint data written")
      // ADVICE r4: every per-round pre-checkpoint cache (persisted so the
      // checkpoint writer reads blocks instead of recomputing the plan) is
      // released again — a long CC run must not accumulate cached iterates
      assert(spark.sparkContext.getPersistentRDDs.size <= cachedBefore,
        s"CC run leaked caches: ${spark.sparkContext.getPersistentRDDs.size} > $cachedBefore")
    } finally {
      // unset so other tests keep using executor-local checkpoints
      spark.sparkContext.setCheckpointDir(null)
    }
  }

  test("CC neighbor-min aggregation is partially aggregated (map-side combine)") {
    val edges = Seq(("a", "b"), ("b", "c")).toDF("a", "b")
    // capture the aggregate shape of one iteration's building block
    val sym = edges.select($"a".as("src"), $"b".as("dst"))
      .unionAll(edges.select($"b".as("src"), $"a".as("dst")))
    val assign = sym.select($"src".as("id")).distinct().withColumn("comp", $"id")
    val nbrMin = sym.join(assign.withColumnRenamed("id", "dst"), Seq("dst"))
      .groupBy($"src").agg(min($"comp"))
    val plan = nbrMin.queryExecution.executedPlan.toString
    // two HashAggregates (partial + final) around the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"no partial aggregation:\n$plan")
  }

  test("trained blocking plan: hot-key broadcast anti-join, no all-pairs join") {
    val recs = spark.range(200).selectExpr("id as rid", "concat('tok', id % 40, ' tail', id) as f")
    val rules = graft.learn.PredicateZoo.stringPredicates("f")
      .filter(_.name == "(firstTokenPredicate, f)")
    val pairs = graft.learn.TrainedDedupe.blockPairsResolved(recs, rules, DedupConfig())
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"learned-predicate hot-key drop is not a broadcast anti-join:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in learned blocking:\n${plan.take(3000)}")
    // two-sided variant: same properties
    val lp = graft.learn.TrainedDedupe.linkPairs(recs, recs, rules, DedupConfig())
    val lplan = lp.queryExecution.executedPlan.toString
    assert(lplan.contains("LeftAnti") &&
      !lplan.contains("CartesianProduct") && !lplan.contains("BroadcastNestedLoopJoin"))
  }

  test("tfidf weights and df table share one tf aggregation sub-plan (r3 fix)") {
    // the df table returned by tfidfWeightsWithDf must BE a subtree of the
    // weights plan — that is what lets exchange reuse run the corpus scan +
    // tf shuffle once; a caller-side re-aggregation (the r3 defect) would
    // not satisfy sameResult
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", split($"text", " ").as("terms"))
    val (w, dfTab) = graft.ops.Comparators.tfidfWeightsWithDf(docs, "doc_id", "terms", 500L)
    val dfPlan = dfTab.queryExecution.analyzed
    assert(w.queryExecution.analyzed.exists(_.sameResult(dfPlan)),
      "df table is not a shared subtree of the weights plan")
    // and at runtime the shared exchange is actually reused
    val q = graft.ops.PipelineOps.tfidfSearch(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"no exchange reuse in the executed tfidf_search plan:\n${plan.take(4000)}")
  }

  test("dedupNgramJaccard: one token aggregation, exchange reused, no cache (r5 fix)") {
    val q = graft.ops.PipelineOps.dedupNgramJaccard(spark, sf)
    q.collect() // ReusedExchange only materializes in the post-AQE plan
    val plan = q.queryExecution.executedPlan.toString
    // r3 shared the token scan via persist; r5 folds minhash + simhash into
    // ONE wide aggregation whose exchange the self-join sides reuse — same
    // shared-scan property, no materialization cost
    assert(!plan.contains("InMemoryTableScan"),
      s"unexpected cache in the ngram-jaccard plan:\n${plan.take(4000)}")
    assert(plan.contains("ReusedExchange"),
      s"token aggregation exchange not reused across the LSH self-join:\n${plan.take(4000)}")
  }
}
