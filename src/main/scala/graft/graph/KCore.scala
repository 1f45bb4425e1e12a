package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core extraction by iterative degree peeling (no clusty counterpart —
  * a standard link-graph analytics operator: the maximal subgraph in which
  * every vertex has degree ≥ k; used for spam/core-periphery structure on
  * web graphs).
  *
  * Each round: one partial-aggregated degree count + two semi-joins that
  * drop edges touching sub-k vertices; lazy localCheckpoint per round keeps
  * the plan O(1) and the convergence count materializes it (one job per
  * round, same discipline as CC/PageRank). Rounds are O(peeling depth),
  * which is small on power-law graphs.
  */
object KCore {

  /** @param edges (src, dst) any orientation; self-loops ignored.
    * @return (vertex: Long) — the vertices of the k-core (may be empty). */
  def coreVertices(spark: SparkSession, edges: DataFrame, k: Int,
                   maxIter: Int = 100): DataFrame = {
    require(k >= 1)
    var bi = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"), greatest(col("src"), col("dst")).as("dst"))
      .distinct()
      .flatMap2Bi()
      .localCheckpoint(true)

    var nEdges = bi.count()
    var it = 0
    var stable = false
    // free peel k-1's checkpoint blocks once peel k is materialized
    var releasePrev: () => Unit = () => ()
    while (!stable && it < maxIter && nEdges > 0) {
      val deg = bi.groupBy(col("src")).agg(count(lit(1)).as("d"))
      val keep = deg.where(col("d") >= k).select(col("src").as("v"))
      val (next, release) = graft.core.Superstep.checkpointReleasable(bi
        .join(keep.withColumnRenamed("v", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("v", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))) // materialized by the count below
      val n2 = next.count()
      stable = n2 == nEdges
      nEdges = n2
      releasePrev()
      releasePrev = release
      bi = next
      it += 1
    }
    bi.select(col("src").as("vertex")).distinct()
  }

  private implicit class BiOps(df: DataFrame) {
    /** Symmetrize a canonical (src<dst) edge list. */
    def flatMap2Bi(): DataFrame =
      df.union(df.select(col("dst").as("src"), col("src").as("dst")))
  }
}
