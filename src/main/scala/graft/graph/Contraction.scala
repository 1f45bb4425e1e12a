package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph contraction (coarsening) by a vertex→group mapping — the
  * link-graph workhorse behind "page graph → host graph" rollups on
  * Common-Crawl-style corpora (and the same operation [[Louvain]] performs
  * internally per level against its community mapping).
  *
  * Scale shape: two hash joins of the edge table against the mapping (the
  * mapping is vertex-sized — broadcast when it fits, sort-merge otherwise;
  * Catalyst/AQE decides), then one partial-aggregated groupBy on the
  * contracted endpoints. No driver-side state; intra-group mass either
  * drops or is kept as explicit self-loop rows, never double-counted.
  */
object Contraction {

  /** Contract an undirected weighted edge table.
    *
    * @param edges   (src, dst, weight) — orientation-insensitive; parallel
    *                edges contribute their summed weight.
    * @param mapping (vertex, group) — group may be any equality-comparable
    *                type (long community id, host string, brand string).
    *                Vertices missing from the mapping drop with their edges
    *                (inner join — the mapping defines the retained universe).
    * @param keepSelfLoops keep intra-group mass as (g, g, w) rows
    *                (Louvain-style contraction) instead of dropping it.
    * @return (src, dst, weight) over groups, src <= dst canonical order.
    */
  def contract(edges: DataFrame, mapping: DataFrame,
               keepSelfLoops: Boolean = false): DataFrame = {
    val m = mapping.select(col("vertex"), col("group"))
    val relabeled = edges
      .join(m.select(col("vertex").as("src"), col("group").as("ga")), "src")
      .join(m.select(col("vertex").as("dst"), col("group").as("gb")), "dst")
      .select(least(col("ga"), col("gb")).as("src"),
        greatest(col("ga"), col("gb")).as("dst"),
        col("weight"))
    val filtered = if (keepSelfLoops) relabeled
      else relabeled.where(col("src") =!= col("dst"))
    filtered.groupBy(col("src"), col("dst")).agg(sum(col("weight")).as("weight"))
  }
}
