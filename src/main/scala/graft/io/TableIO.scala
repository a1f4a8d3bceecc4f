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
