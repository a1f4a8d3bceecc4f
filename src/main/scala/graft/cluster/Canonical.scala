package graft.cluster

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.texthash.AffineGap

/**
 * Cluster canonicalization — port of `dedupe/canonical.py`:
 * per-field centroid = the value minimizing average affine-gap distance to
 * the other values (`getCentroid`, canonical.py:10-53; ties -> first value,
 * `breakCentroidTie`, canonical.py:41-53); per-cluster canonical record from
 * non-empty values (`getCanonicalRep`, canonical.py:56-79).
 *
 * Distributed form: `groupBy(cluster_id)` + per-group centroid inside an
 * aggregation (clusters are small — components are capped upstream). For
 * webtext a cheap representative (longest text / min url) is usually enough;
 * both are provided.
 */
object Canonical {

  /** `getCentroid` (canonical.py:10-53): min average distance, ties -> first. */
  def getCentroid(values: Seq[String],
                  comparator: (String, String) => Float =
                    AffineGap.normalizedAffineGapDistance): String = {
    val n = values.length
    require(n > 0, "getCentroid of empty sequence")
    if (n == 1) return values.head
    val dist = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < i) {
        val d = comparator(values(i), values(j)).toDouble
        dist(i)(j) = d; dist(j)(i) = d
        j += 1
      }
      i += 1
    }
    // numpy matrix.mean(0): column means (== row means by symmetry),
    // including the zero diagonal
    val avg = (0 until n).map(c => (0 until n).map(r => dist(r)(c)).sum / n)
    val minAvg = avg.min
    values(avg.indexOf(minAvg)) // first index at the minimum (tie-break)
  }

  /** `getCanonicalRep` for a single field: centroid over non-empty values,
    * "" when none. */
  def canonicalField(values: Seq[String]): String = {
    val nonEmpty = values.filter(v => v != null && v.nonEmpty)
    if (nonEmpty.isEmpty) "" else getCentroid(nonEmpty)
  }

  /**
   * Distributed canonical representative per cluster:
   * affine-gap centroid of the `textCol` values (reference semantics), plus
   * the cheap representatives (min id, longest text) for the webtext path.
   *
   * @param clustered (idCol, cluster_id, textCol)
   */
  def canonicalize(clustered: DataFrame, idCol: String = "url",
                   textCol: String = "text"): DataFrame = {
    val spark = clustered.sparkSession
    import spark.implicits._
    clustered
      .select(col("cluster_id"), col(idCol).as("_id"), col(textCol).as("_text"))
      .as[(String, String, String)]
      .groupByKey(_._1)
      .mapGroups { (clusterId, it) =>
        val rows = it.toSeq.sortBy(_._2) // deterministic input order by id
        val texts = rows.map(_._3)
        val centroid = canonicalField(texts)
        val longest = rows.maxBy(r => (if (r._3 == null) -1 else r._3.length, r._2))._2
        (clusterId, rows.map(_._2).min, longest, centroid)
      }
      .toDF("cluster_id", "rep_min_id", "rep_longest_id", "canonical_text")
  }
}
