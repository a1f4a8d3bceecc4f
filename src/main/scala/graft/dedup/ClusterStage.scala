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

  final case class LabeledEdge(a: String, b: String, score: Float, comp: String)
  final case class ClusterRow(url: String, cluster_id: String, confidence: Double)

  /** @param labeled (a, b, score, comp) scored edges with component labels */
  def clusterComponents(labeled: DataFrame, threshold: Double): Dataset[ClusterRow] = {
    val spark = labeled.sparkSession
    import spark.implicits._
    labeled
      .select($"a", $"b", $"score".cast("float").as("score"), $"comp")
      .as[LabeledEdge]
      .groupByKey(_.comp)
      .flatMapGroups { (_, it) =>
        val edges = it.map(e => Edge(e.a, e.b, e.score.toDouble)).toSeq
        LocalClustering.clusterComponent(edges, threshold).iterator.flatMap { c =>
          val clusterId = c.members.min
          c.members.zip(c.confidences).map { case (m, conf) => ClusterRow(m, clusterId, conf) }
        }
      }
  }

  /** Singleton completion: every page not in any cluster becomes its own
    * cluster with confidence 1.0 (`api.py:209-218`) — a left-anti join. */
  def addSingletons(pages: DataFrame, clustered: Dataset[ClusterRow],
                    idCol: String = "url"): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val singles = pages.select(col(idCol).as("url"))
      .join(clustered.select($"url"), Seq("url"), "left_anti")
      .select($"url", $"url".as("cluster_id"), lit(1.0).as("confidence"))
    clustered.toDF().unionAll(singles)
  }
}
