package graft

import org.apache.spark.sql.SparkSession

/**
 * Two-cluster-size scaling evidence (north rule: throughput scaling
 * efficiency >= 0.8 between N and 4N executors; in-sandbox realized as
 * local[N] vs local[4N] on the same input — see BASELINE.md).
 *
 * Runs the identical flagship pipeline at each parallelism level in a fresh
 * SparkSession and prints one JSON line with throughputs and efficiency
 * = (docs/sec at 4N) / (docs/sec at N) / 4.
 *
 * Usage: runMain graft.ScalingBench [sfDir] [nCores] [n4Cores]
 */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val nLo = args.lift(1).map(_.toInt).getOrElse(8)
    val nHi = args.lift(2).map(_.toInt).getOrElse(32)

    def runAt(cores: Int): (Long, Double, Long) = {
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val pages = graft.data.WebText.benchCorpus(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = pages.count()
      val t0 = System.nanoTime()
      val out = graft.dedup.Pipeline.run(spark, pages, graft.dedup.DedupConfig()).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.stop()
      // a fresh session per level; SparkSession.clearActiveSession for safety
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      (nDocs, sec, out)
    }

    // warm JIT once at low parallelism on a small slice? No — identical runs,
    // JIT warmup shared across both since same JVM; low first, then high.
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
