package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Optimization-round measurement harness (guide §1) — SEPARATE from the
 * frozen [[Bench]]: per-query noop-sink timings (so the computation is
 * measured, not the count short-circuit), optional repeat passes, per-stage
 * pipeline timings, and `.explain("formatted")` capture for the plan audit.
 *
 * Usage: `sbt "runMain graft.BenchExtra [--plans <outDir>] [--reps N]
 *                                       [--only q1,q2,...]"`.
 * Prints one JSON line per repetition pass; plans land in `<outDir>/<q>.txt`.
 */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark")
    new java.io.File(localDir).mkdirs()

    var plansDir: Option[String] = None
    var reps = 1
    var only: Option[Set[String]] = None
    var stages = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--plans" => plansDir = Some(args(i + 1)); i += 2
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--only" => only = Some(args(i + 1).split(",").toSet); i += 2
        case "--stages" => stages = true; i += 1
        case "--probe" => i += 1
        case "--kernels" => i += 1
        case "--reusecheck" => i += 1
        case other => sys.error(s"unknown arg $other")
      }
    }

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "256m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val benchQueries = Seq(
      "q1_agg", "q_join_agg", "q_window_topn", "q_anti_join", "q_sort_limit",
      "pred_token_field", "pred_fingerprint", "pred_common_four_gram",
      "pairs_self_join", "score_jaccard_tokens", "score_cosine_tfidf",
      "score_lcs_suffix", "cluster_cc",
      "dedup_exact", "dedup_minhash_sig", "dedup_simhash16",
      "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_embed_cosine",
      "tfidf_search",
      "text_token_stats", "text_quality", "text_langid", "text_fingerprint",
      "ann_l2_topk", "mm_binary_meta",
      "learn_cover", "learn_weighted_sample")
      .filter(q => only.forall(_.contains(q)))

    // plan capture (driver-only, cheap)
    plansDir.foreach { dir =>
      new java.io.File(dir).mkdirs()
      benchQueries.foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          val plan = try fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          catch { case e: Throwable => s"explain failed: $e" }
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/$name.txt"), plan.getBytes("UTF-8"))
        }
      }
    }

    // exchange-reuse diagnosis: does AQE materialize a self-join's two
    // identical exchanges once or twice, with and without a cached source?
    if (args.contains("--reusecheck")) {
      import org.apache.spark.sql.functions._
      def stages(df0: org.apache.spark.sql.DataFrame, label: String): Unit = {
        // aggregate to a scalar so collect() drives THIS QueryExecution and
        // finalizes its adaptive plan (a noop write would wrap a new one)
        val df = df0.agg(sum(col("a") + col("b")))
        df.collect()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val shuffles = "ShuffleQueryStage \\((\\d+)\\)".r
          .findAllMatchIn(plan).map(_.group(1)).toSet
        println(s"REUSECHECK $label distinct_shuffle_stages=${shuffles.size} ids=${shuffles.toSeq.sorted}")
        sys.env.get("REUSECHECK_PLANS").foreach { dir =>
          new java.io.File(dir).mkdirs()
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/$label.txt"), plan.getBytes("UTF-8"))
        }
      }
      val base = spark.range(0, 500000)
        .select((col("id") % 9973).as("key"), col("id").as("v"))
      // plain source
      val kept1 = base.filter(col("v") % 17 =!= 3)
      stages(kept1.as("x").join(kept1.as("y").hint("shuffle_hash"),
        col("x.key") === col("y.key") && col("x.v") < col("y.v"))
        .select(col("x.v").as("a"), col("y.v").as("b")), "plain")
      // cached source (the pipeline's shape: kept derives from a cache)
      val cached = base.persist()
      cached.count()
      val kept2 = cached.filter(col("v") % 17 =!= 3)
      stages(kept2.as("x").join(kept2.as("y").hint("shuffle_hash"),
        col("x.key") === col("y.key") && col("x.v") < col("y.v"))
        .select(col("x.v").as("a"), col("y.v").as("b")), "cached")
      // cached + broadcast anti-join (full pipeline kept shape)
      val hot = cached.groupBy(col("key")).agg(count(lit(1)).as("df"))
        .filter(col("df") > 1000).select(col("key"))
      val kept3 = cached.join(broadcast(hot), Seq("key"), "left_anti")
      stages(kept3.as("x").join(kept3.as("y").hint("shuffle_hash"),
        col("x.key") === col("y.key") && col("x.v") < col("y.v"))
        .select(col("x.v").as("a"), col("y.v").as("b")), "cached+anti")
      // candidate fix: cache the join input repartitioned by the join key —
      // both sides then read the (once-materialized) cache; if
      // InMemoryTableScan preserves the repartition's outputPartitioning,
      // the join plans with NO further exchange on either side
      val keptRep = kept1.repartition(col("key")).persist()
      keptRep.count()
      stages(keptRep.as("x").join(keptRep.as("y").hint("shuffle_hash"),
        col("x.key") === col("y.key") && col("x.v") < col("y.v"))
        .select(col("x.v").as("a"), col("y.v").as("b")), "cachedRep")
      keptRep.unpersist()
      // same self-join with AQE off: does the static ReuseExchange rule fire?
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val dfOff = kept1.as("x").join(kept1.as("y").hint("shuffle_hash"),
        col("x.key") === col("y.key") && col("x.v") < col("y.v"))
        .select(col("x.v").as("a"), col("y.v").as("b"))
        .agg(sum(col("a") + col("b")))
      dfOff.collect()
      val planOff = dfOff.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"REUSECHECK aqe-off reused=${"ReusedExchange".r.findAllIn(planOff).size} " +
        s"exchanges=${"Exchange".r.findAllIn(planOff).size}")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.stop(); return
    }

    // single-threaded kernel microbench over real corpus texts: isolates
    // per-document CPU from host weather and Spark overheads (guide §1:
    // per-task work is optimized only after the job shape is right — this
    // mode tells us WHICH kernel is the per-task cost)
    if (args.contains("--kernels")) {
      val cfg = graft.dedup.DedupConfig()
      import org.apache.spark.sql.functions._
      val spark2 = spark
      import spark2.implicits._
      val texts = graft.data.WebText.benchCorpus(spark, sfDir)
        .select($"text").limit(50000).as[String].collect()
      println(s"KERNELS corpus n=${texts.length} " +
        s"avg_len=${texts.map(_.length.toLong).sum / texts.length}")
      def bench(name: String, reps: Int)(f: String => Any): Unit = {
        var sink = 0L
        (1 to reps).foreach { _ => // warmup + steady: report the last rep
          val t0 = System.nanoTime()
          var i = 0
          while (i < texts.length) {
            val r = f(texts(i))
            sink ^= (if (r == null) 0L else r.hashCode().toLong)
            i += 1
          }
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"KERNEL $name%-16s ${dt}%.3f s (${dt * 1e9 / texts.length}%.0f ns/doc) sink=${sink % 7}")
        }
      }
      val norm = texts.map(graft.texthash.TextHash.normalizeText)
      val shingles = norm.map(t => graft.texthash.TextHash.shingleHashes(t, cfg.shingleK, cfg.seed))
      bench("normalize", 3)(t => graft.texthash.TextHash.normalizeText(t))
      bench("shingles", 3)(t => graft.texthash.TextHash.shingleHashes(
        graft.texthash.TextHash.normalizeText(t), cfg.shingleK, cfg.seed))
      locally {
        (1 to 3).foreach { _ =>
          val t0 = System.nanoTime(); var i = 0; var sink = 0L
          while (i < shingles.length) {
            sink ^= graft.texthash.TextHash.minhashSignature(shingles(i), cfg.numHashes, cfg.seed).length
            i += 1
          }
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"KERNEL minhash128     ${dt}%.3f s (${dt * 1e9 / shingles.length}%.0f ns/doc) sink=${sink % 7}")
        }
      }
      bench("simhash", 3)(t => graft.texthash.TextHash.simhashText(
        graft.texthash.TextHash.normalizeText(t), cfg.seed))
      bench("suffix_keys", 3)(t => graft.texthash.TextHash.suffixKeys(
        graft.texthash.TextHash.normalizeText(t), cfg.suffixWidth, cfg.suffixEvery, cfg.seed))
      spark.stop(); return
    }

    // deep probe of the pairs/scored internals: row counts + sub-timings,
    // isolated by persisting each boundary (current pipeline shape)
    if (args.contains("--probe")) {
      val cfg = graft.dedup.DedupConfig()
      import org.apache.spark.sql.functions._
      val spark2 = spark
      import spark2.implicits._
      val pages = graft.data.WebText.benchCorpus(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pages.count()
      val t = scala.collection.mutable.LinkedHashMap[String, Double]()
      val c = scala.collection.mutable.LinkedHashMap[String, Long]()
      val normalized = pages.select($"url", xxhash64($"url").as("nid"),
        graft.expr.functions.normalize_text($"text").as("text"))
      t("collision_check") = time {
        val bad = normalized.groupBy($"nid")
          .agg(min($"url").as("u1"), max($"url").as("u2"))
          .filter($"u1" =!= $"u2").count()
        require(bad == 0)
      }
      val sigs = graft.dedup.Blocking.signatures(
        normalized.filter($"text".isNotNull).select($"nid", $"text"), cfg, idCol = "nid")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("signatures_mat") = time { noop(sigs) }
      val nDocs = sigs.count()
      val keys = graft.dedup.Blocking.blockKeys(sigs, cfg, idCol = "nid", carryFp = true)
      t("keys_noop") = time { noop(keys) }
      val cap = graft.dedup.Blocking.hotKeyCap(nDocs, cfg)
      val counts = keys.groupBy($"key").agg(count(lit(1)).as("df"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("counts") = time { c("n_distinct_keys") = counts.count() }
      val hot = counts.filter($"df" > cap).select($"key")
      val kept = keys.join(broadcast(hot), Seq("key"), "left_anti")
      val pairs = kept.as("x").join(kept.as("y").hint("shuffle_hash"),
        col("x.key") === col("y.key") && col("x.nid") < col("y.nid") &&
          graft.expr.functions.hamming64(col("x.fp"), col("y.fp")) <= cfg.scoreMaxHamming)
        .select(col("x.nid").as("a"), col("y.nid").as("b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("pairs_join_mat") = time { c("n_pairs_prefiltered") = pairs.count() }
      val surv = pairs.distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("survivors_distinct") = time { c("n_survivors") = surv.count() }
      val sh = sigs.select($"nid".as("sid"), $"shingles").hint("shuffle_hash")
      val jac = surv
        .join(sh.withColumnRenamed("sid", "a").withColumnRenamed("shingles", "sh_a"), Seq("a"))
        .join(sh.withColumnRenamed("sid", "b").withColumnRenamed("shingles", "sh_b"), Seq("b"))
        .select($"a", $"b", graft.expr.functions.jaccard_sorted($"sh_a", $"sh_b").as("jac"))
        .filter($"jac" > cfg.minScore)
      t("verify_noop") = time { noop(jac) }
      // ALTERNATIVE pair-gen shape: hot-key filter via a window count over
      // the join's own exchange (no counts aggregation, no broadcast, no
      // eager stats job) — timed against the production shape above.
      val w2 = org.apache.spark.sql.expressions.Window.partitionBy($"key")
      val keptW = keys.withColumn("df", count(lit(1)).over(w2))
        .filter($"df" <= cap).drop("df")
      val pairsW = keptW.as("x").join(keptW.as("y"),
        col("x.key") === col("y.key") && col("x.nid") < col("y.nid") &&
          graft.expr.functions.hamming64(col("x.fp"), col("y.fp")) <= cfg.scoreMaxHamming)
        .select(col("x.nid").as("a"), col("y.nid").as("b"))
      t("pairs_window_shape_noop") = time { noop(pairsW) }
      t("pairs_current_shape_noop") = time {
        val kept2 = keys.join(broadcast(counts.filter($"df" > cap).select($"key")),
          Seq("key"), "left_anti")
        noop(kept2.as("x").join(kept2.as("y").hint("shuffle_hash"),
          col("x.key") === col("y.key") && col("x.nid") < col("y.nid") &&
            graft.expr.functions.hamming64(col("x.fp"), col("y.fp")) <= cfg.scoreMaxHamming)
          .select(col("x.nid").as("a"), col("y.nid").as("b")))
      }
      println("PROBE counts " + c.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
      println("PROBE times " + t.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}"))
      spark.stop(); return
    }

    // per-stage pipeline timing (noop per stage, cumulative config as in
    // Pipeline.run but materializing each boundary once)
    if (stages) {
      val cfg = graft.dedup.DedupConfig()
      val pages = graft.data.WebText.benchCorpus(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = pages.count()
      val st = scala.collection.mutable.LinkedHashMap[String, Double]()
      import org.apache.spark.sql.functions._
      val spark2 = spark
      import spark2.implicits._
      val normalized = pages.select($"url", xxhash64($"url").as("nid"),
        graft.expr.functions.normalize_text($"text").as("text"))
      st("normalize+collision") = time {
        val bad = normalized.groupBy($"nid")
          .agg(min($"url").as("u1"), max($"url").as("u2"))
          .filter($"u1" =!= $"u2").count()
        require(bad == 0)
      }
      val sigs = graft.dedup.Blocking.signatures(
        normalized.filter($"text".isNotNull).select($"nid", $"text"), cfg, idCol = "nid")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      st("signatures") = time { noop(sigs) }
      val nDocs = sigs.count()
      var pairs: DataFrame = null
      st("pairs") = time {
        val keys = graft.dedup.Blocking.blockKeys(sigs, cfg, idCol = "nid", carryFp = true)
        val res = graft.dedup.Blocking.candidatePairs(keys, nDocs, cfg, idCol = "nid",
          dedup = false, maxHamming = cfg.scoreMaxHamming)
        pairs = res.pairs
        noop(pairs)
      }
      var scored: DataFrame = null
      st("scored") = time {
        scored = graft.dedup.Scoring.scorePairs(pairs, sigs, idCol = "nid",
          minScore = cfg.minScore, maxHamming = 64, dedupePairs = true,
          seed = cfg.seed, lcsDfCap = cfg.hotKeyAbsCap)
        scored = scored.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        noop(scored)
      }
      var labeled: DataFrame = null
      st("components") = time {
        labeled = graft.dedup.ConnectedComponents.withRefilter(scored, cfg.maxComponents)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        noop(labeled)
      }
      var clustered: org.apache.spark.sql.Dataset[graft.dedup.ClusterStage.ClusterRow] = null
      st("cluster_components") = time {
        clustered = graft.dedup.ClusterStage.clusterComponents(labeled, cfg.threshold, cfg.maxComponents)
        clustered = clustered.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        noop(clustered.toDF())
      }
      var withSingles: DataFrame = null
      st("add_singletons") = time {
        withSingles = graft.dedup.ClusterStage.addSingletons(normalized.select($"nid"), clustered)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        noop(withSingles)
      }
      st("to_urls") = time {
        noop(graft.dedup.ClusterStage.toUrls(withSingles, normalized.select($"nid", $"url")))
      }
      println("STAGES " + st.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}") + s""" docs=$n""")
      pages.unpersist(); sigs.unpersist(); scored.unpersist()
    }

    (1 to reps).foreach { rep =>
      val results = scala.collection.mutable.LinkedHashMap[String, Double]()
      benchQueries.foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          spark.sparkContext.setJobDescription(s"extra:$name")
          results(name) = try time(noop(fn(spark, sfDir))) catch { case _: Throwable => -1.0 }
          spark.sparkContext.setJobDescription(null)
        }
      }
      val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      val total = results.values.filter(_ >= 0).sum
      println(s"""{"rep":$rep,"metric":"extra_total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
