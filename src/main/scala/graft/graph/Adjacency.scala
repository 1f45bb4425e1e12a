package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Salted CSR-style adjacency blocks (north rule: "adjacency materialized as
  * salted, range-partitioned per-partition blocks with explicit skew
  * splitting of hub vertices").
  *
  * A plain `groupBy(src).collect_list(...)` puts a hub vertex's entire
  * neighbor list in ONE task's memory — at web scale a degree-10⁸ hub kills
  * the executor. Here every vertex's adjacency is split into blocks of at
  * most `blockSize` neighbors *before* the list is materialized:
  *
  *   1. degrees (one partial-aggregated shuffle);
  *   2. salt = hash(src, dst) mod ceil(degree / blockSize) — deterministic,
  *      no RNG, uniform across a hub's edges;
  *   3. `groupBy(src, salt).collect_list(struct(dst, weight))` — per-task
  *      memory is bounded by ~blockSize regardless of skew;
  *   4. blocks range-partitioned + sorted by (src, salt): a CSR-like layout
  *      where each vertex's blocks are contiguous, so a downstream
  *      per-vertex merge is a local (already-clustered) pass.
  *
  * Consumers that aggregate per-vertex (PageRank sums, LPA counts) combine
  * per-(src, salt) partials first and re-aggregate per-src — the two-phase
  * pattern this module exists to make explicit. SURVEY.md §7 step 4.
  */
object Adjacency {

  /** @param edges (src: Long, dst: Long, weight: Double)
    * @param blockSize max neighbors per block (per-task memory bound)
    * @return (src, salt, n_neighbors, neighbors: array<struct<dst,weight>>)
    *         range-partitioned and sorted by (src, salt). */
  def blocks(spark: SparkSession, edges: DataFrame, blockSize: Int = 1 << 20): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("weight").cast("double"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("degree"))
    val nSalts = greatest(lit(1L), ceil(col("degree") / lit(blockSize.toDouble)).cast("long"))
    e.join(deg, "src")
      .select(col("src"),
        pmod(xxhash64(col("src"), col("dst")), nSalts).as("salt"),
        col("dst"), col("weight"))
      .groupBy(col("src"), col("salt"))
      .agg(count(lit(1)).as("n_neighbors"),
        collect_list(struct(col("dst"), col("weight"))).as("neighbors"))
      .repartitionByRange(col("src"), col("salt"))
      .sortWithinPartitions(col("src"), col("salt"))
  }

  /** Rebuild the flat edge view from blocks (inverse of [[blocks]] up to
    * row order) — consumers that need edges again explode locally. */
  def explodeBlocks(blocks: DataFrame): DataFrame =
    blocks.select(col("src"), explode(col("neighbors")).as("n"))
      .select(col("src"), col("n.dst").as("dst"), col("n.weight").as("weight"))

  /** Per-vertex degree from blocks: two-phase (block partials are already
    * counted, so this is a cheap re-aggregate on src). */
  def degreesFromBlocks(blocks: DataFrame): DataFrame =
    blocks.groupBy(col("src")).agg(sum(col("n_neighbors")).as("degree"))
}
