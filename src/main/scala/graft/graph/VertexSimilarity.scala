package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Neighborhood-overlap similarity of adjacent vertex pairs — the classic
  * link-prediction / edge-strength signal (no clusty counterpart; a standard
  * web-graph operator):
  *
  *   jaccard(a,b) = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|
  *                = common / (deg(a) + deg(b) − common)
  *
  * Common-neighbor counts come from one wedge join (bi ⋈ bi on the middle
  * vertex) semi-restricted to existing edges, so the work is the same
  * O(Σ deg²)-bounded shape as triangle counting; degrees are one
  * partial-aggregated shuffle. All equi-joins, AQE free to pick physical
  * strategies.
  */
object VertexSimilarity {

  /** @param edges (src, dst) any orientation.
    * @return (a, b, common, jaccard) for every canonical edge a < b. */
  def edgeJaccard(spark: SparkSession, edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val bi = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))

    val deg = bi.groupBy(col("u")).agg(count(lit(1)).as("d"))

    // length-2 paths a–c–b with a<b, collapsed per (a,b)
    val l = bi.select(col("v").as("c"), col("u").as("a"))
    val r = bi.select(col("v").as("c"), col("u").as("b"))
    val common = l.join(r, "c").where(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))

    e.join(common, Seq("a", "b"), "left")
      .join(deg.select(col("u").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("u").as("b"), col("d").as("db")), "b")
      .select(col("a"), col("b"),
        coalesce(col("common"), lit(0L)).as("common"),
        round(coalesce(col("common"), lit(0L)) /
          (col("da") + col("db") - coalesce(col("common"), lit(0L))), 6).as("jaccard"))
  }
}
