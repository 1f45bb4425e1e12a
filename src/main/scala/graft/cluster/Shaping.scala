package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Ranking

/** clusty's output-shaping semantics as window/join transforms
  * (SURVEY.md §2.4-2.5):
  *
  *  - A3 renumber clusters decreasingly by size, stable ties
  *    (reference: src/graph.cpp:22-48)
  *  - O1 final ordering (cluster asc, member order asc)
  *    (reference: src/graph_named.h:307-309,355-357)
  *  - O2 singleton objects (in universe, absent from graph) get fresh ids
  *    appended after in-graph clusters (reference: src/graph_named.h:330-352)
  *  - O3 representative fill: cluster id column replaced by the first member
  *    in final order (reference: src/graph.h:126-149)
  *
  * The global dense renumberings (A3, O2) go through [[Ranking.withGlobalRank]]
  * — a range-partitioned sort + zipWithIndex, never a single-partition
  * window: cluster count is O(V), and on a web-scale universe MOST objects
  * are singletons, so both orderings are full-size datasets. The remaining
  * window (O3) is partitioned by cluster. The final orderings are
  * range-partitioned sorts, fine at scale because the assignment table is
  * O(vertices), not O(edges).
  */
object Shaping {

  /** A3 — renumber clusters 0..k-1 by decreasing size; ties keep ascending
    * old-cluster-id order (the stable_sort semantics: old ids are assignment
    * order in the reference, min-member id here — both stable/deterministic).
    *
    * @param assign (object, cluster) — any types.
    * @return (object, cluster) with dense new ids, plus `cluster_size`.
    */
  def renumberBySize(assign: DataFrame): DataFrame = {
    val sizes = assign.groupBy(col("cluster")).agg(count(lit(1)).as("cluster_size"))
    val renum = Ranking.withGlobalRank(sizes, "new_cluster",
      col("cluster_size").desc, col("cluster").asc)
    assign.join(renum, "cluster")
      .select(col("object"), col("new_cluster").as("cluster"), col("cluster_size"))
  }

  /** O2 — append universe objects that have no assignment as singleton
    * clusters, numbered `nClusters, nClusters+1, ...` in universe rank order.
    *
    * @param assign   (object, cluster:long) — already renumbered 0..k-1.
    * @param universe (object, rank:long) — full object universe + priority.
    */
  def appendSingletons(assign: DataFrame, universe: DataFrame): DataFrame = {
    val nClusters = assign.agg(coalesce(max(col("cluster")) + lit(1L), lit(0L)))
      .head().getLong(0)
    val missing = universe.join(assign, Seq("object"), "left_anti")
      .select(col("object"), col("rank"))
    val singletons = Ranking.withGlobalRank(missing, "_rn", col("rank").asc)
      .select(col("object"), (col("_rn") + lit(nClusters)).cast("long").as("cluster"))
    assign.select(col("object"), col("cluster").cast("long")).unionByName(singletons)
  }

  /** O1 — final output order: cluster asc, then member order (name asc when
    * no universe ranks; universe rank asc otherwise). Adds `member_order`
    * for deterministic downstream byte-compare. */
  def ordered(assign: DataFrame, rankCol: Option[String] = None): DataFrame = {
    val tie = rankCol.map(col).getOrElse(col("object"))
    assign.orderBy(col("cluster").asc, tie.asc)
  }

  /** O3 — replace the cluster id with the cluster's representative: the first
    * member in final order. Partial-aggregating min_by argmax + join back,
    * not a per-cluster window — a window would sort a giant cluster's full
    * member list in one task just to read its head (round 6; tie keys are
    * unique per cluster in every caller, so the argmax is deterministic). */
  def fillRepresentatives(assign: DataFrame, rankCol: Option[String] = None): DataFrame = {
    val tie = rankCol.map(col).getOrElse(col("object"))
    val reps = assign.groupBy(col("cluster"))
      .agg(min_by(col("object"), tie).as("cluster_rep"))
    assign.join(reps, "cluster")
      .select(col("object"), col("cluster_rep"), col("cluster"))
  }
}
