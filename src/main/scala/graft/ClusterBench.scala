package graft

import org.apache.spark.sql.SparkSession

/**
 * spark-submit entry for one timed flagship-pipeline run on whatever master
 * the submitter provides — used with `local-cluster[N,cores,mem]` masters to
 * produce the north rule's N-vs-4N-EXECUTOR scaling evidence with real,
 * separate executor JVMs (own heaps, GC, and netty shuffle — unlike
 * local[K]'s single shared JVM). See tools/scaling_cluster.sh for the
 * interleaved-trial driver and BASELINE.md for accepted results.
 *
 * Prints one JSON line: {"docs":N,"sec":S,"docs_per_sec":T,"out_rows":R}
 * (out_rows lets the harness assert identical results across levels).
 *
 * Usage: spark-submit --class graft.ClusterBench <jar> [sfDir] [mult]
 */
object ClusterBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(60)
    val spark = SparkSession.builder().getOrCreate() // master/conf from spark-submit
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup on a small slice: JIT/codegen in the fresh executor JVMs
    graft.dedup.Pipeline.run(spark, graft.data.WebText.synthetic(spark, 2000).toDF(),
      graft.dedup.DedupConfig()).count()

    val pages = graft.data.WebText.benchCorpus(spark, sfDir, mult)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = pages.count()
    val t0 = System.nanoTime()
    val out = graft.dedup.Pipeline.run(spark, pages, graft.dedup.DedupConfig()).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val json = f"""{"docs":$nDocs,"sec":$sec%.1f,"docs_per_sec":${nDocs / sec}%.1f,"out_rows":$out}"""
    sys.env.get("SPARK_GRAFT_CLUSTER_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p), (json + "\n").getBytes("UTF-8"))
    }
    println(json)
    spark.stop()
  }
}
