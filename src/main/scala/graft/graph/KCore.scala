package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-core operators: single-k core extraction (degree peeling) and the full
  * core-number decomposition (h-index fixpoint). The core number of a vertex
  * is the largest k such that the vertex survives in the k-core (the maximal
  * subgraph where every vertex has degree >= k) — the classic web-graph
  * quality/centrality signal (no clusty counterpart — an addition for
  * link-graph analytics, like PageRank; SURVEY.md §2.6 note).
  *
  * Distributed algorithm: h-index iteration (Montresor, De Pellegrini,
  * Miorandi, "Distributed k-Core Decomposition", IEEE TPDS 2013). Each
  * vertex starts at its degree and repeatedly updates to the h-index of its
  * neighbors' current estimates (the largest h such that >= h neighbors have
  * estimate >= h). Estimates are always >= the true core number, decrease
  * monotonically, and the fixpoint IS the core decomposition — a driver
  * superstep loop of pure join/aggregate, O(diameter)-ish rounds in
  * practice.
  *
  * Scale design, same discipline as [[PageRank]]:
  *  - the symmetrized neighbor table is built once, partitioned on src, and
  *    persisted — each superstep exchanges only the (vertex, core) estimate
  *    table;
  *  - the h-index is a window rank over each vertex's neighbor estimates —
  *    sorting happens inside the neighbor-group partition, no extra
  *    exchange beyond the per-superstep groupBy;
  *  - integer state end to end: results are EXACT (no float-rounding
  *    concerns in the cross-engine oracle), and the update is
  *    order-independent, so the fixpoint is deterministic under any
  *    parallelism;
  *  - lineage truncated per superstep via the stats-resetting checkpoint,
  *    dead superstep state released eagerly.
  */
object KCore {

  /** Vertices of the single k-core, by iterative degree peeling. Each
    * round: one partial-aggregated degree count + two semi-joins that drop
    * edges touching sub-k vertices; lazy localCheckpoint per round keeps
    * the plan O(1) and the convergence count materializes it (one job per
    * round, same discipline as CC/PageRank). Rounds are O(peeling depth),
    * which is small on power-law graphs. For the whole decomposition in one
    * pass, use [[run]].
    *
    * @param edges (src, dst) any orientation; self-loops ignored.
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

  /** Full core-number decomposition.
    *
    * @param edges (src, dst) undirected pairs (any orientation, dups ok;
    *              self-loops ignored).
    * @return (vertex: Long, core: Long) — core = core number.
    */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 64): DataFrame = {
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()
    // Symmetrized neighbor list, partitioned ONCE on dst — the key of the
    // per-superstep estimates join — so the big table never re-exchanges;
    // each superstep moves the (vertex, core) table plus one ranked-message
    // exchange for the h-index window (the unavoidable message delivery).
    val nbrs = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("dst"))
      .localCheckpoint(true)

    // init: estimate = degree
    var cores = nbrs.groupBy(col("src").as("vertex"))
      .agg(count(lit(1)).as("core"))
      .localCheckpoint(true)

    var it = 0
    var converged = false
    var releasePrev: () => Unit = () => ()
    while (!converged && it < maxIter) {
      // neighbor estimates, grouped per vertex: rank neighbors by estimate
      // descending (neighbor id as deterministic tiebreak — the h-index is
      // tie-insensitive, the ordering just fixes the physical sort), then
      // h = max over ranked neighbors of min(rank, estimate).
      val w = Window.partitionBy("v").orderBy(col("c").desc, col("nbr").asc)
      val msgs = nbrs
        .join(cores, nbrs("dst") === cores("vertex"))
        .select(nbrs("src").as("v"), col("dst").as("nbr"), col("core").as("c"))
      val h = msgs
        .withColumn("rn", row_number().over(w).cast("long"))
        .groupBy(col("v"))
        .agg(max(least(col("rn"), col("c"))).as("h"))
      // new estimate; join back to detect the fixpoint in the same pass.
      // h <= old estimate always (estimates start at degree and neighbors
      // only fall), so no explicit least(old, h) is needed — but keeping
      // old_core lets one aggregate compute the convergence count.
      val next0 = h.join(cores, h("v") === cores("vertex"))
        .select(col("vertex"), col("h").as("core"), col("core").as("old_core"))
      val (next, release) = graft.core.Superstep.checkpointReleasable(next0)
      val changed = next
        .agg(count(when(col("core") =!= col("old_core"), lit(1))).as("n"))
        .head().getLong(0)
      converged = changed == 0L
      releasePrev()
      releasePrev = release
      cores = next.select(col("vertex"), col("core"))
      it += 1
    }
    cores
  }
}
