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
  * A common neighbor c of the ADJACENT pair (a,b) closes a triangle, so
  * common(a,b) = number of triangles containing edge (a,b). Counts therefore
  * come from [[TriangleCount.triangles]]'s degree-oriented wedge join, which
  * bounds every middle vertex's out-degree by O(√m) — total work O(m^1.5)
  * regardless of skew. (A naive wedge join on the raw middle vertex emits
  * deg(c)² pairs per hub: a degree-10⁶ vertex would produce 10¹² rows in one
  * task.) Degrees are one partial-aggregated shuffle; all equi-joins, AQE
  * free to pick physical strategies.
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

    // each (a<b<c) triangle contributes one common neighbor to each of its
    // three edges
    val tri = TriangleCount.triangles(spark, e.select(col("a").as("src"), col("b").as("dst")))
    val common = tri.select(explode(array(
        struct(col("a").as("a"), col("b").as("b")),
        struct(col("a").as("a"), col("c").as("b")),
        struct(col("b").as("a"), col("c").as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
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
