package graft.dedup

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.cluster.LocalClustering
import graft.cluster.LocalClustering.Edge

/**
 * Record-linkage matchers — the distributed `RecordLink`/`Gazetteer` output
 * stages (`clustering.py:284-325`):
 *
 *  - [[greedyOneToOne]]: greedy one-to-one matching. Inherently sequential in
 *    the reference, but greedy choices never cross connected components, so
 *    the exact sequential semantics are recovered by running the reference
 *    scan per component inside `flatMapGroups` (components bounded as usual).
 *  - [[gazetteTopN]]: top-n per query — a window function.
 */
object Matching {

  /** Greedy one-to-one matching (`clustering.py:284-296`): descending score,
    * keep a pair iff both sides unseen. Exact reference semantics per
    * connected component; ties broken by (score desc, a, b) — the
    * reference's own tie order is numpy-sort-stability over an unspecified
    * SQL row order, so any fixed rule is equally faithful. */
  def greedyOneToOne(scored: DataFrame): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val assign = ConnectedComponents.run(scored.select($"a", $"b"))
    val labeled = scored
      .join(assign.withColumnRenamed("id", "a").withColumnRenamed("comp", "comp"), Seq("a"))
      .select($"a", $"b", $"score".cast("double").as("score"), $"comp")
      .as[(String, String, Double, String)]
    labeled
      .groupByKey(_._4)
      .flatMapGroups { (_, it) =>
        val edges = it.map { case (a, b, s, _) => Edge(a, b, s) }.toSeq
          .sortBy(e => (-e.score, e.a, e.b))
        LocalClustering.greedyMatching(edges).iterator
      }
      .toDF("a", "b", "score")
  }

  /** Gazetteer top-n per query id (`clustering.py:299-311`):
    * filter score > threshold, rank desc, keep n. */
  def gazetteTopN(scored: DataFrame, threshold: Double, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a")).orderBy(col("score").desc, col("b").asc)
    scored.filter(col("score") > threshold)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= n)
  }
}
