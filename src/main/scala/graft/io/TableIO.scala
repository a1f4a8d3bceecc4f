package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Thin storage seam (SURVEY.md §7.0): Iceberg in production (when an Iceberg
 * catalog is configured on the session), partitioned Parquet in-sandbox —
 * same call sites either way, so nothing upstream leaks format assumptions.
 *
 * Checkpoints are the resumability mechanism the north rule requires: each
 * pipeline stage is written once and re-read; a restarted driver skips every
 * stage whose checkpoint is already complete (Parquet `_SUCCESS` marker /
 * Iceberg snapshot).
 */
object TableIO {

  /** True when an Iceberg catalog named `graft` is configured (spark-submit
    * production path); the sandbox has no Iceberg jar so this stays false. */
  def icebergAvailable(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.sql.catalog.graft").isDefined

  def read(spark: SparkSession, path: String): DataFrame =
    if (icebergAvailable(spark)) spark.read.format("iceberg").load(path)
    else spark.read.parquet(path)

  def write(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w0 = df.write.mode("overwrite")
    val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    if (icebergAvailable(df.sparkSession)) w.format("iceberg").save(path)
    else w.parquet(path)
  }

  /** Schema guard for persisted signature tables feeding `jaccard_sorted`:
    * shingles migrated from array<bigint> (32-bit-masked) to array<int> in
    * an on-disk-incompatible way (old arrays are also sorted in unsigned-
    * long order, so even a value-preserving cast would merge wrong). Fail
    * fast with a migration message instead of misreading. */
  def requireIntShingles(df: DataFrame, context: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    df.schema.find(_.name == "shingles").foreach { f =>
      f.dataType match {
        case ArrayType(IntegerType, _) => ()
        case other => throw new IllegalStateException(
          s"$context: persisted `shingles` column has type ${other.sql}, expected ARRAY<INT>. " +
            "This table was written by a pre-int32-shingle build and cannot be read back " +
            "(element width AND sort order changed); re-index / re-run the producing stage " +
            "with the current build to migrate.")
      }
    }
    df
  }

  /**
   * Crash-safe replace of a parquet table (the sandbox stand-in for an
   * Iceberg `MERGE INTO`/`DELETE` commit): write the replacement to
   * `path__tmp`, swap the live table aside to `path__old`, promote tmp,
   * drop old. The live table is never deleted before the replacement is
   * fully written AND the previous version survives (as `__old`) until the
   * promotion rename completes — any crash leaves a state [[recoverSwap]]
   * can roll forward or back.
   */
  def swapWrite(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "__tmp")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    write(df, tmp.toString)
    if (fs.exists(old)) fs.delete(old, true) // leftover of a crashed swap
    if (fs.exists(live)) fs.rename(live, old)
    fs.rename(tmp, live)
    fs.delete(old, true)
  }

  /** Complete or roll back a [[swapWrite]] interrupted by a crash: if the
    * live table is missing, promote a fully-written `__tmp` (its `_SUCCESS`
    * marker proves completeness) or else restore `__old` — never silently
    * start empty when a previous version exists. */
  def recoverSwap(spark: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "__tmp")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    if (!fs.exists(live)) {
      if (checkpointExists(spark, tmp.toString)) fs.rename(tmp, live)
      else if (fs.exists(old)) fs.rename(old, live)
    }
    if (fs.exists(live)) { fs.delete(tmp, true); fs.delete(old, true) }
  }

  /** Live presence of a swap-maintained table, after crash recovery. */
  def swapTableExists(spark: SparkSession, path: String): Boolean = {
    if (!icebergAvailable(spark)) recoverSwap(spark, path)
    checkpointExists(spark, path)
  }

  /** A checkpoint is complete when its `_SUCCESS` marker exists. */
  def checkpointExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Compute-or-resume: if `path` holds a complete checkpoint, read it;
    * otherwise compute `df`, persist it there, and read it back (so the
    * downstream plan is rooted at the checkpoint, cutting lineage). */
  def checkpoint(spark: SparkSession, path: String)(df: => DataFrame): DataFrame = {
    if (!checkpointExists(spark, path)) write(df, path)
    read(spark, path)
  }
}
