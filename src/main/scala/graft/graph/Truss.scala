package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-truss: the maximal subgraph in which every edge closes at least k−2
  * triangles WITHIN the subgraph (Cohen 2008, "Trusses: cohesive subgraphs
  * for social network analysis"). A strictly stronger cohesion filter than
  * k-core — on web link graphs it isolates tightly-knit link farms and
  * genuine communities that degree-based peeling lets through.
  *
  * Distributed peeling to a fixpoint: each round recomputes per-edge
  * support from [[TriangleCount.triangles]] — the degree-oriented wedge
  * join, so per-round work is O(m^1.5) regardless of hub skew and never
  * enumerates a hub's O(deg²) neighbor pairs in one task — then drops
  * edges below k−2 and repeats. Dropping an edge only ever lowers other
  * edges' support, so peeling is monotone and terminates in ≤ m rounds
  * (in practice a handful). Every round is scan + equi-join + partial
  * aggregate (AQE free to broadcast the shrinking edge set); loop-carried
  * state goes through Superstep.checkpointReleasable so dead rounds free
  * their shuffle/cache blocks immediately.
  */
object Truss {

  /** Edges of the k-truss with their fixpoint support.
    *
    * @param edges (src, dst) any orientation; self-loops/duplicates ignored.
    * @return (a, b, support) with a < b — the surviving undirected edges and
    *         the number of triangles each closes within the truss. */
  def truss(spark: SparkSession, edges: DataFrame, k: Int, maxIter: Int = 64): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    val minSup = (k - 2).toLong

    var (ed, release) = graft.core.Superstep.checkpointReleasable(
      TriangleCount.canonicalEdges(edges), eager = true)
    var n = ed.count()
    var it = 0
    var result: DataFrame = null
    try {
      while (result == null) {
        if (it >= maxIter)
          throw new IllegalStateException(
            s"truss(k=$k) did not reach a fixpoint in $maxIter peeling rounds")
        // per-edge support: every triangle (a<b<c) supports its three edges
        // (ed is already canonical; the rename just satisfies the src/dst
        // input contract — re-canonicalization inside is a no-op)
        val tri = TriangleCount.triangles(spark,
          ed.select(col("a").as("src"), col("b").as("dst")))
        val triEdges = tri.select(explode(array(
            struct(col("a").as("x"), col("b").as("y")),
            struct(col("a").as("x"), col("c").as("y")),
            struct(col("b").as("x"), col("c").as("y")))).as("e"))
          .select(col("e.x").as("a"), col("e.y").as("b"))
        val sup = triEdges.groupBy("a", "b").agg(count(lit(1)).as("support"))
        val withSup = ed.join(sup, Seq("a", "b"), "left")
          .select(col("a"), col("b"), coalesce(col("support"), lit(0L)).as("support"))
        val (ws, relWs) = graft.core.Superstep.checkpointReleasable(withSup, eager = true)
        try {
          val kept = ws.where(col("support") >= minSup)
          val nKept = kept.count()
          if (nKept == n) { // fixpoint: ws's support reflects the final edge set
            release() // ed is dead; ws's blocks stay live for the caller
            result = ws
          } else {
            val (next, relNext) = graft.core.Superstep.checkpointReleasable(
              kept.select("a", "b"), eager = true)
            release(); relWs()
            ed = next; release = relNext; n = nKept; it += 1
          }
        } catch {
          // free this round's support checkpoint on abnormal exit (round-5
          // ADVICE: the maxIter/throw path must not leak live blocks)
          case t: Throwable => relWs(); throw t
        }
      }
      result
    } catch {
      case t: Throwable => release(); throw t // frees the live ed checkpoint
    }
  }
}
