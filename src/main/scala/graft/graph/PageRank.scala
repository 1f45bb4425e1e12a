package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Pregel-style PageRank as pure Dataset joins/aggregations (the north-rule
  * flagship; no clusty counterpart — clusty's iterative loops are BFS/greedy,
  * SURVEY.md §2.6 note).
  *
  * Design for 100 TB:
  *  - `links` (edge list joined with out-degree) is computed once, hash
  *    re-partitioned on `src` and persisted — every superstep's
  *    ranks-into-links join then shuffles only the small rank table, the
  *    big edge table stays put.
  *  - contributions are partial-aggregated map-side (`groupBy(dst).sum`),
  *    so hub fan-in skew is combined before the exchange.
  *  - dangling mass is one scalar aggregate per superstep, redistributed
  *    uniformly — standard normalized PageRank; total mass stays 1.
  *  - every superstep `localCheckpoint`s the new rank table: lineage is
  *    O(1), and the checkpointed table is the resumable frontier state (on
  *    a cluster this becomes a write to an Iceberg/parquet `ranks_step_k`
  *    table; `RankState` captures the same contract).
  *  - convergence = driver-side `max(abs(delta))` aggregate, compared to
  *    `tol`; both our runs and the in-test oracle converge to the same
  *    epsilon so float-sum reorder noise stays below the compare tolerance.
  */
object PageRank {

  final case class Result(ranks: DataFrame, iterations: Int, converged: Boolean)

  /** @param edges (src: Long, dst: Long) directed; parallel edges allowed
    *              (they weight the transition like multi-links).
    * @return ranks (vertex: Long, rank: Double), sum(rank) == 1 (±fp noise).
    */
  def run(spark: SparkSession, edges: DataFrame, damping: Double = 0.85,
          tol: Double = 1e-8, maxIter: Int = 100): Result = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))

    val vertices = e.select(col("src").as("vertex"))
      .union(e.select(col("dst").as("vertex")))
      .distinct()
      .repartition(col("vertex"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = vertices.count()

    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // Pre-divide: contribution factor per edge = 1/outdeg(src).
    val links = e.join(outDeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("outdeg")).as("share"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    links.count() // materialize once

    var ranks = vertices.select(col("vertex"), lit(1.0 / n).as("rank"))
      .localCheckpoint(true)

    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // Mass sitting on dangling vertices (no out-edges) this superstep.
      val danglingMass = ranks.join(outDeg, ranks("vertex") === outDeg("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)

      val contribs = links
        .join(ranks, links("src") === ranks("vertex"))
        .select(col("dst"), (col("rank") * col("share")).as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("in_mass"))

      val base = (1.0 - damping) / n + damping * danglingMass / n
      val newRanks = vertices
        .join(contribs, vertices("vertex") === contribs("dst"), "left")
        .select(col("vertex"),
          (lit(base) + lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("rank"))
        .localCheckpoint(true)

      val delta = newRanks.as("a").join(ranks.as("b"), "vertex")
        .agg(max(abs(col("a.rank") - col("b.rank")))).head().getDouble(0)

      ranks = newRanks
      it += 1
      converged = delta < tol
    }
    Result(ranks, it, converged)
  }

  /** Undirected convenience: run on the symmetrized edge set. */
  def runUndirected(spark: SparkSession, edges: DataFrame, damping: Double = 0.85,
                    tol: Double = 1e-8, maxIter: Int = 100): Result = {
    val bi = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    run(spark, bi, damping, tol, maxIter)
  }
}
