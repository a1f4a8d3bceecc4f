package graft

import org.apache.spark.sql.SparkSession

/**
 * Two-cluster-size scaling evidence (north rule: throughput scaling
 * efficiency >= 0.8 between N and 4N executors; in-sandbox realized as
 * local[N] vs local[4N] on the same input — see BASELINE.md).
 *
 * Methodology: per parallelism level, a fresh SparkSession runs the flagship
 * pipeline once untimed on a small slice (JIT + codegen warmup — a real
 * cluster's executors are long-lived), then the measured run on the full
 * corpus. Efficiency = (docs/sec at 4N) / (docs/sec at N) / 4. The corpus is
 * sized by `mult` (default 60x synthetic entities per source document) so
 * fixed per-job scheduling overhead — a constant that vanishes at real
 * scale — does not dominate the measurement.
 *
 * Usage: runMain graft.ScalingBench [sfDir] [nCores] [n4Cores] [mult]
 */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val nLo = args.lift(1).map(_.toInt).getOrElse(8)
    val nHi = args.lift(2).map(_.toInt).getOrElse(32)
    val mult = args.lift(3).map(_.toInt).getOrElse(60)

    def runAt(cores: Int): (Long, Double, Long) = {
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", math.max(cores, 8))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")

      // untimed warmup on a small slice (JIT/codegen; executors on a real
      // cluster are warm long before a 10^12-doc job's steady state)
      val warm = graft.data.WebText.synthetic(spark, 2000).toDF()
      graft.dedup.Pipeline.run(spark, warm, graft.dedup.DedupConfig()).count()

      val pages = graft.data.WebText.benchCorpus(spark, sfDir, mult)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = pages.count()
      val t0 = System.nanoTime()
      val out = graft.dedup.Pipeline.run(spark, pages, graft.dedup.DedupConfig()).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      (nDocs, sec, out)
    }

    val (docs1, sec1, out1) = runAt(nLo)
    val (docs2, sec2, out2) = runAt(nHi)
    require(out1 == out2, s"output rows differ across parallelism: $out1 vs $out2")
    val tpLo = docs1 / sec1
    val tpHi = docs2 / sec2
    val eff = (tpHi / tpLo) / (nHi.toDouble / nLo)
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","cores_lo":$nLo,"cores_hi":$nHi,""" +
        f""""docs":$docs1,"sec_lo":$sec1%.1f,"sec_hi":$sec2%.1f,"docs_per_sec_lo":$tpLo%.1f,"docs_per_sec_hi":$tpHi%.1f,"sf":"$sfDir"}""")
  }
}
