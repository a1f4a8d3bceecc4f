package graft.learn

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Terminal front-end for [[ConsoleLabel]] — the actual
 * `dedupe.console_label(deduper)` experience (`convenience.py:122-199`)
 * over a parquet corpus:
 *
 * {{{
 * spark-submit --class graft.learn.ConsoleLabelMain <jar> \
 *   <records.parquet> <ridCol> <fieldCol> <settingsOut.json>
 * }}}
 *
 * Prompts go to stderr and commands are read from stdin, exactly like the
 * reference (`convenience.py:100-101`). On finish the session trains from
 * the collected labels and writes a crash-safe settings file a
 * `StaticDedupe` run can load ([[TrainedDedupe.readSettings]]).
 */
object ConsoleLabelMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: ConsoleLabelMain <records.parquet> <ridCol> <fieldCol> <settingsOut.json>")
    val Array(path, ridCol, fieldCol, out) = args
    val spark = SparkSession.builder()
      // spark-submit's --master wins via the spark.master sysprop; plain
      // JVM/sbt launches fall back to local[32]
      .master(sys.props.getOrElse("spark.master", "local[32]"))
      .appName("graft-console-label")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    val records = spark.read.parquet(path)
      .select(col(ridCol).cast("long").as("rid"), col(fieldCol).as("f"))
    // the reference's up-front candidate pool (labeler.py:229-241): a
    // capped record sample, pairs drawn by inverse-coverage votes
    val sample = Cover.sampleRecords(records, cap = 5000)
    val nRecs = sample.count()
    val pool = Cover.weightedPairSample(sample,
      PredicateZoo.stringPredicates("f"), nRecs,
      sampleSize = 500, maxCover = nRecs * (nRecs - 1) / 2)
      .select(col("a").as("id_a"), col("b").as("id_b"))
    val learner = new ActiveLearner(records, pool)
    learner.seed() // labeler.py:436-452: 4x exact self-match + 1 negative
    val stdin = Iterator.continually(scala.io.StdIn.readLine())
      .takeWhile(_ != null)
    val n = ConsoleLabel.run(learner, stdin, line => System.err.println(line))
    System.err.println(s"$n labels committed; training…")
    TrainedDedupe.writeSettings(spark, out, learner.train())
    System.err.println(s"settings written to $out")
    spark.stop()
  }
}
