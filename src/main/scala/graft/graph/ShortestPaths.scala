package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unweighted single-source shortest paths (BFS hop levels) over the
  * undirected graph — "click distance" on a link graph.
  *
  * Pregel-style frontier expansion: one superstep = frontier ⋈ edges →
  * candidate neighbors (min-aggregated map-side), anti-joined against the
  * settled set; converges in eccentricity(source) supersteps (each a
  * constant number of hash-partitioned exchanges — no global funnel).
  * Loop state goes through [[graft.core.Superstep.checkpoint]], keeping the
  * logical plan O(1) across supersteps. Returns (vertex, dist) for
  * REACHABLE vertices only — at web scale the unreachable complement is the
  * overwhelming majority and materializing it would be wasteful; left-join
  * downstream if absent-means-infinity semantics are needed.
  */
object ShortestPaths {

  /** Result of a converging weighted run: final distances + how many
    * supersteps were actually needed (≈ the weighted-path hop depth). */
  final case class Sssp(dist: DataFrame, supersteps: Int)

  /** Weighted single-source shortest paths (Bellman-Ford supersteps) over
    * the undirected graph with non-negative `weightCol` edge lengths —
    * "strongest path" distance when lengths are 1/similarity. Reachable
    * vertices only, like [[hops]].
    *
    * Two modes:
    *  - `fixedIters = Some(n)`: exactly n full-relaxation supersteps, no
    *    convergence test. This is what lets the DuckDB oracle replay the
    *    per-iteration min exactly (extra iterations past the fixpoint are
    *    no-ops; each candidate distance is a sum accumulated in path order
    *    on both engines, so the mins agree IEEE-bit-for-bit). Only for
    *    replay-style validation — it does Θ(E) work per superstep forever.
    *  - default (`fixedIters = None`): delta-frontier Bellman-Ford — only
    *    vertices whose distance improved last superstep re-relax their
    *    edges (the [[hops]] pattern), terminating on an empty delta after
    *    ~weighted-hop-diameter supersteps. Identical result bit-for-bit
    *    (both modes take the min over the same path-ordered sums; the
    *    delta mode merely skips relaxations that cannot improve anything).
    *    Throws if still improving after `maxIters` — a silently truncated
    *    distance is a wrong answer, not a partial one. */
  def weighted(spark: SparkSession, edges: DataFrame, source: Long,
               weightCol: String = "weight", fixedIters: Option[Int] = None,
               maxIters: Int = 256): DataFrame = fixedIters match {
    case Some(n) =>
      import spark.implicits._
      val bi = biweighted(edges, weightCol)
      var dist = Seq((source, 0.0)).toDF("vertex", "dist")
        .transform(graft.core.Superstep.checkpoint(_, eager = true))
      for (_ <- 0 until n) {
        val relaxed = dist.join(bi, dist("vertex") === bi("src"))
          .select(bi("dst").as("vertex"), (dist("dist") + bi("w")).as("dist"))
        dist = graft.core.Superstep.checkpoint(
          dist.unionByName(relaxed).groupBy("vertex").agg(min(col("dist")).as("dist")),
          eager = true)
      }
      dist
    case None => weightedDelta(spark, edges, source, weightCol, maxIters).dist
  }

  /** Delta-frontier mode with the superstep count exposed (see [[weighted]]). */
  def weightedDelta(spark: SparkSession, edges: DataFrame, source: Long,
                    weightCol: String = "weight", maxIters: Int = 256): Sssp = {
    import spark.implicits._
    val bi = biweighted(edges, weightCol)
    var dist = Seq((source, 0.0)).toDF("vertex", "dist")
      .transform(graft.core.Superstep.checkpoint(_, eager = true))
    var delta = dist
    var it = 0
    var done = false
    while (!done) {
      // relax only the vertices that improved last superstep
      val cand = delta.join(bi, delta("vertex") === bi("src"))
        .select(bi("dst").as("vertex"), (delta("dist") + bi("w")).as("cd"))
        .groupBy("vertex").agg(min(col("cd")).as("cd"))
      val improved = graft.core.Superstep.checkpoint(
        cand.join(dist, Seq("vertex"), "left")
          .where(col("dist").isNull || col("cd") < col("dist"))
          .select(col("vertex"), col("cd").as("dist")))
      if (improved.count() == 0L) done = true
      else {
        it += 1
        if (it >= maxIters)
          throw new IllegalStateException(
            s"weighted SSSP still improving after $maxIters supersteps — " +
              "raise maxIters (deep weighted paths) instead of truncating distances")
        // lazy checkpoint: the merge materializes inside the next
        // superstep's count, keeping ~1 extra job per superstep
        dist = graft.core.Superstep.checkpoint(
          dist.unionByName(improved).groupBy("vertex").agg(min(col("dist")).as("dist")))
        delta = improved
      }
    }
    Sssp(dist, it)
  }

  private def biweighted(edges: DataFrame, weightCol: String): DataFrame = {
    val e0 = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"),
        col(weightCol).cast("double").as("w"))
      .where(col("src") =!= col("dst"))
    e0.union(e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .localCheckpoint(true)
  }

  def hops(spark: SparkSession, edges: DataFrame, source: Long,
           maxIter: Int = 64): DataFrame = {
    import spark.implicits._
    val e0 = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    // parallel edges are harmless under the min-aggregate — no distinct
    val bi = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)

    var settled = Seq((source, 0L)).toDF("vertex", "dist")
      .transform(graft.core.Superstep.checkpoint(_, eager = true))
    var frontier = settled
    var it = 0
    var done = false
    while (!done && it < maxIter) {
      val cand = frontier.join(bi, frontier("vertex") === bi("src"))
        .select(bi("dst").as("vertex"), (frontier("dist") + lit(1L)).as("dist"))
        .groupBy("vertex").agg(min(col("dist")).as("dist"))
      // 1-job-per-superstep discipline: lazy checkpoints, materialized by
      // the single count() (the settled union folds into the next
      // superstep's first action)
      val next = graft.core.Superstep.checkpoint(
        cand.join(settled.select("vertex"), Seq("vertex"), "left_anti"))
      if (next.count() == 0L) done = true
      else {
        settled = graft.core.Superstep.checkpoint(settled.unionByName(next))
        frontier = next
        it += 1
      }
    }
    settled
  }

  /** Multi-source BFS: [[hops]] generalized to a source SET in one run —
    * the state/frontier key is (source, vertex), so k sources cost one
    * traversal with k-wide frontiers instead of k traversals (the k
    * expansions share every edge exchange). The landmark-distance primitive
    * behind closeness/harmonic-centrality estimates on web graphs
    * (Bavelas-style centrality over a pivot sample).
    *
    * @return (source, vertex, dist) for reachable pairs only. */
  def multiHops(spark: SparkSession, edges: DataFrame, sources: Seq[Long],
                maxIter: Int = 64): DataFrame = {
    import spark.implicits._
    require(sources.nonEmpty)
    val e0 = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    val bi = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)

    var settled = sources.map(s => (s, s, 0L)).toDF("source", "vertex", "dist")
      .transform(graft.core.Superstep.checkpoint(_, eager = true))
    var frontier = settled
    var it = 0
    var done = false
    while (!done && it < maxIter) {
      val cand = frontier.join(bi, frontier("vertex") === bi("src"))
        .select(frontier("source").as("source"), bi("dst").as("vertex"),
          (frontier("dist") + lit(1L)).as("dist"))
        .groupBy("source", "vertex").agg(min(col("dist")).as("dist"))
      val next = graft.core.Superstep.checkpoint(
        cand.join(settled.select("source", "vertex"), Seq("source", "vertex"), "left_anti"))
      if (next.count() == 0L) done = true
      else {
        settled = graft.core.Superstep.checkpoint(settled.unionByName(next))
        frontier = next
        it += 1
      }
    }
    settled
  }
}
