package graft

import org.apache.spark.sql.SparkSession

/** Per-stage wall-clock probe for the flagship pipeline at one parallelism
  * level — materializes each stage with a count to attribute time.
  * Usage: runMain graft.ScalingProbe [sfDir] [cores] [mult] */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val mult = args.lift(2).map(_.toInt).getOrElse(60)
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark")
    new java.io.File(localDir).mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores * 2, 16))
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "256m") // the ~15MB/10^6-doc
      // fingerprint map must broadcast reliably at bench scale (prod jobs set
      // 100-512m); at 10^12 docs it exceeds any threshold and AQE picks SMJ
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    // warmup
    graft.dedup.Pipeline.run(spark, graft.data.WebText.synthetic(spark, 2000).toDF(),
      graft.dedup.DedupConfig()).count()

    val cfg = graft.dedup.DedupConfig()
    val pages = graft.data.WebText.benchCorpus(spark, sfDir, mult)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs0 = pages.count()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe $cores%2d] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.1fs")
      r
    }

    val normalized = pages.select($"url", xxhash64($"url").as("nid"),
      graft.expr.functions.normalize_text($"text").as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("normalize")(normalized.count())
    // mirrors Pipeline's signature cache: band keys pre-folded, hash-
    // partitioned on the record id (so the probe's stage split matches the
    // production shape)
    val sigs = graft.dedup.Blocking.signatures(
      normalized.filter($"text".isNotNull).select($"nid", $"text"), cfg, idCol = "nid")
      .withColumn("bkeys", graft.expr.functions.band_keys($"sig", cfg.bands))
      .drop("sig")
      .repartition($"nid")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = time("signatures")(sigs.count())
    val keys = graft.dedup.Blocking.blockKeys(sigs, cfg, idCol = "nid", carryFp = true)
    val pairs = time("pairs") {
      val res = graft.dedup.Blocking.candidatePairs(keys, nDocs, cfg, idCol = "nid",
        dedup = false, maxHamming = cfg.scoreMaxHamming)
      res.pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      res.pairs
    }
    val scored = time("scoring") {
      val sc = graft.dedup.Scoring.scorePairs(pairs, sigs, idCol = "nid",
        minScore = cfg.minScore, maxHamming = 64, dedupePairs = true)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sc.count(); sc
    }
    val labeled = time("components") {
      val l = graft.dedup.ConnectedComponents.withRefilter(scored, cfg.maxComponents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      l.count(); l
    }
    time("clustering") {
      val clustered = graft.dedup.ClusterStage.clusterComponents(labeled, cfg.threshold)
      graft.dedup.ClusterStage.completeAndLabel(
        normalized.select($"nid", $"url"), clustered).count()
    }
    System.err.println(s"[probe] docs=$nDocs0 pairsCached")
    spark.stop()
  }
}
