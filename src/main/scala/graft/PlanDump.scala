package graft

import org.apache.spark.sql.SparkSession

/** Plan capture for the optimization-round audit (before/after explain). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "256m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val names = Seq(
      "q1_agg", "q_join_agg", "q_window_topn", "q_anti_join", "q_sort_limit",
      "pred_token_field", "pred_fingerprint", "pred_common_four_gram",
      "pairs_self_join", "score_jaccard_tokens", "score_cosine_tfidf",
      "score_lcs_suffix", "cluster_cc",
      "dedup_exact", "dedup_minhash_sig", "dedup_simhash16",
      "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_embed_cosine",
      "tfidf_search",
      "text_token_stats", "text_quality", "text_langid", "text_fingerprint",
      "ann_l2_topk", "mm_binary_meta",
      "learn_cover", "learn_weighted_sample", "score_blend_lcs")
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val plan = try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"explain failed: $e" }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/$name.txt"), plan.getBytes("UTF-8"))
      }
    }
    // flagship pipeline: the lazy plan of the scored-pairs stage (the part
    // this round reshapes; the final clusters frame is driver-local after CC)
    val cfg = graft.dedup.DedupConfig()
    import org.apache.spark.sql.functions._
    val pages = graft.data.WebText.benchCorpus(spark, sfDir)
    val spark2 = spark
    import spark2.implicits._
    val normalized = pages.select($"url", xxhash64($"url").as("nid"),
      graft.expr.functions.normalize_text($"text").as("text"))
    val sigs = graft.dedup.Blocking.signatures(
      normalized.filter($"text".isNotNull).select($"nid", $"text"), cfg, idCol = "nid")
    val keys = graft.dedup.Blocking.blockKeys(sigs, cfg, idCol = "nid", carryFp = true)
    val pairs = graft.dedup.Blocking.candidatePairs(keys, 210249L, cfg,
      idCol = "nid", dedup = false, maxHamming = cfg.scoreMaxHamming).pairs
    val scored = graft.dedup.Scoring.scorePairs(pairs, sigs, idCol = "nid",
      minScore = cfg.minScore, maxHamming = 64, dedupePairs = true)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/dedup_pipeline_scored.txt"),
      scored.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
    // scored stage with the signature table persisted as Pipeline persists
    // it — shows whether the two verify-join shingle exchanges share one
    // shuffle (ReusedExchange / repeated node id) when reading the cache
    locally {
      // mirrors Pipeline's signature cache: band keys pre-folded, hash-
      // partitioned on the record id, persisted
      val sigsC = sigs
        .withColumn("bkeys", graft.expr.functions.band_keys($"sig", cfg.bands)).drop("sig")
        .repartition($"nid").persist()
      val keysC = graft.dedup.Blocking.blockKeys(sigsC, cfg, idCol = "nid", carryFp = true)
      val pairsC = graft.dedup.Blocking.candidatePairs(keysC, 210249L, cfg,
        idCol = "nid", dedup = false, maxHamming = cfg.scoreMaxHamming).pairs
      val scoredC = graft.dedup.Scoring.scorePairs(pairsC, sigsC, idCol = "nid",
        minScore = cfg.minScore, maxHamming = 64, dedupePairs = true)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/dedup_pipeline_scored_cached.txt"),
        scoredC.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
      // execute, then dump the FINAL AQE plan: only here is exchange/stage
      // reuse visible (the pre-execution plan shows separate Exchange
      // instances that AQE may or may not dedupe at runtime). collect()
      // drives THIS QueryExecution (a noop write would wrap a new one and
      // leave scoredC's adaptive plan unfinalized); the scored edge list is
      // ~159k (a, b, score) rows — driver-safe here.
      scoredC.collect()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/dedup_pipeline_scored_executed.txt"),
        scoredC.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
      sigsC.unpersist()
    }
    // pipeline pairs stage in both signature-cache shapes: `sig` carried
    // into blockKeys (pre-r6 fold-twice shape) vs the pre-folded `bkeys`
    // column Pipeline now caches (fold-once; same key values)
    Seq(
      "dedup_pipeline_pairs_sigcache" -> sigs,
      "dedup_pipeline_pairs_bkeyscache" ->
        sigs.withColumn("bkeys", graft.expr.functions.band_keys($"sig", cfg.bands)).drop("sig")
    ).foreach { case (name, sigTab0) =>
      // persisted like Pipeline's signature cache, so the plan shows what a
      // consumer reads back (the cached columns), not a re-inlined subtree
      val sigTab = sigTab0.persist()
      val k = graft.dedup.Blocking.blockKeys(sigTab, cfg, idCol = "nid", carryFp = true)
      val p = graft.dedup.Blocking.candidatePairs(k, 210249L, cfg,
        idCol = "nid", dedup = false, maxHamming = cfg.scoreMaxHamming).pairs
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name.txt"),
        p.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
      sigTab.unpersist()
    }
    // cluster labeling stage (completeAndLabel) over a stand-in clustered set
    val clustered = spark.createDataset(Seq(
      graft.dedup.ClusterStage.ClusterRow(1L, 1L, 0.9),
      graft.dedup.ClusterStage.ClusterRow(2L, 1L, 0.9)))
    val labelStage = graft.dedup.ClusterStage.completeAndLabel(
      normalized.select($"nid", $"url"), clustered)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/dedup_pipeline_label.txt"),
      labelStage.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
    spark.stop()
  }
}
