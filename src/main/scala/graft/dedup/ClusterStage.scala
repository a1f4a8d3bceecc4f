package graft.dedup

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.cluster.LocalClustering
import graft.cluster.LocalClustering.Edge

/**
 * Per-component hierarchical clustering + singleton completion — the
 * distributed realization of `cluster` (`clustering.py:213-255`) and
 * `_add_singletons` (`api.py:209-218`).
 *
 * Components (capped at `maxComponents` nodes by
 * [[ConnectedComponents.withRefilter]] — the same memory bound the reference
 * relies on) are shuffled once via `groupByKey(comp)` and clustered inside
 * `flatMapGroups` with the scipy-parity centroid-linkage port
 * ([[graft.cluster.Hierarchical]]).
 *
 * Output schema: (url, cluster_id, confidence) — the normalized form of the
 * reference's (members tuple, confidences tuple) stream; cluster_id is the
 * lexicographically smallest member (deterministic under any parallelism).
 */
object ClusterStage {

  final case class LabeledEdge(a: Long, b: Long, score: Float, comp: Long)
  final case class ClusterRow(nid: Long, cluster_nid: Long, confidence: Double)

  /** @param labeled (a, b, score, comp) scored edges (compact long ids) with
    *               component labels — MUST have passed
    *               [[ConnectedComponents.withRefilter]] at `maxComponents`:
    *               the centroid-linkage kernel allocates n(n-1)/2 doubles
    *               per component in one task (see
    *               [[DedupConfig.maxComponents]]), so an over-cap component
    *               here fails loudly instead of OOMing the executor
    * @param maxComponents the refilter cap to enforce; <= 0 disables */
  def clusterComponents(labeled: DataFrame, threshold: Double,
                        maxComponents: Int = 30000): Dataset[ClusterRow] = {
    val spark = labeled.sparkSession
    import spark.implicits._
    labeled
      .select($"a", $"b", $"score".cast("float").as("score"), $"comp")
      .as[LabeledEdge]
      .groupByKey(_.comp)
      .flatMapGroups { (_, it) =>
        val edges = it.map(e => Edge(e.a, e.b, e.score.toDouble)).toSeq
        if (maxComponents > 0) {
          val nNodes = edges.iterator.flatMap(e => Iterator(e.a, e.b)).toSet.size
          if (nNodes > maxComponents) throw new IllegalStateException(
            s"component of $nNodes nodes exceeds maxComponents=$maxComponents — " +
              "the condensed distance matrix would need " +
              s"~${nNodes.toLong * (nNodes - 1) / 2 * 8 / (1 << 20)} MB in one task; " +
              "run ConnectedComponents.withRefilter first (Pipeline does)")
        }
        LocalClustering.clusterComponent(edges, threshold).iterator.flatMap { c =>
          val clusterId = c.members.min
          c.members.zip(c.confidences).map { case (m, conf) => ClusterRow(m, clusterId, conf) }
        }
      }
  }

  /** Singleton completion: every page not in any cluster becomes its own
    * cluster with confidence 1.0 (`api.py:209-218`) — a left-anti join on the
    * compact id. */
  def addSingletons(pageIds: DataFrame, clustered: Dataset[ClusterRow],
                    idCol: String = "nid"): DataFrame = {
    val spark = pageIds.sparkSession
    import spark.implicits._
    val singles = pageIds.select(col(idCol).as("nid"))
      .join(clustered.select($"nid"), Seq("nid"), "left_anti")
      .select($"nid", $"nid".as("cluster_nid"), lit(1.0).as("confidence"))
    clustered.toDF().unionAll(singles)
  }

  /** Map compact-id cluster rows back to urls; the public cluster_id is the
    * lexicographically smallest member url (deterministic, human-readable).
    * @param ids (nid, url) mapping table */
  def toUrls(clusters: DataFrame, ids: DataFrame): DataFrame = {
    val byNid = clusters.join(ids, Seq("nid"))
      .select(col("url"), col("cluster_nid"), col("confidence"))
    val clusterName = byNid.groupBy(col("cluster_nid"))
      .agg(min(col("url")).as("cluster_id"))
    byNid.join(clusterName, Seq("cluster_nid"))
      .select(col("url"), col("cluster_id"), col("confidence"))
  }
}
