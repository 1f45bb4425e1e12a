package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Triangle counting by ordered wedge join (no clusty counterpart — new
  * operator per the north rule).
  *
  * Canonicalize to a < b, then join wedges (a,b)+(b,c) with a<b<c against the
  * edge set on (a,c): each triangle is produced exactly once. The ordering
  * constraint is the classic degree/id-orientation trick that keeps hub
  * vertices from exploding the wedge join — every wedge is generated at its
  * middle vertex only for ordered pairs, and the final probe is an equi-join
  * Catalyst executes as shuffled hash join (broadcast if the edge set is
  * small). All skew-prone aggregates are partial-aggregated map-side.
  */
object TriangleCount {

  /** Canonical unique undirected edges (a < b). */
  def canonicalEdges(edges: DataFrame): DataFrame =
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()

  /** All triangles as (a, b, c) with a < b < c, each exactly once. */
  def triangles(spark: SparkSession, edges: DataFrame): DataFrame = {
    val e = canonicalEdges(edges)
    val e1 = e.toDF("a", "b")
    val e2 = e.toDF("b", "c")
    val wedges = e1.join(e2, "b").where(col("a") < col("c"))
      .select(col("a"), col("b"), col("c"))
    val closing = e.toDF("a", "c")
    wedges.join(closing, Seq("a", "c")).select(col("a"), col("b"), col("c"))
  }

  /** Global triangle count: single-row DataFrame (n_triangles: Long). */
  def globalCount(spark: SparkSession, edges: DataFrame): DataFrame =
    triangles(spark, edges).agg(count(lit(1)).as("n_triangles"))

  /** Per-vertex triangle participation count (vertices in no triangle get 0). */
  def perVertex(spark: SparkSession, edges: DataFrame): DataFrame = {
    val tri = triangles(spark, edges)
    val hits = tri.select(explode(array(col("a"), col("b"), col("c"))).as("vertex"))
      .groupBy("vertex").agg(count(lit(1)).as("n_triangles"))
    val vertices = canonicalEdges(edges)
      .select(explode(array(col("a"), col("b"))).as("vertex")).distinct()
    vertices.join(hits, Seq("vertex"), "left")
      .select(col("vertex"), coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }
}
