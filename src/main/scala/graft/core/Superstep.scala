package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftshim.GraftShim

/** Loop-state checkpointing for iterative (Pregel-style) operators.
  *
  * Every superstep loop in the engine (PageRank, CC, LPA, k-core, HITS,
  * Louvain) carries its state through `localCheckpoint` so the logical plan
  * stays O(1) per step. Plain `localCheckpoint` is NOT enough: it copies the
  * pre-checkpoint plan's estimated statistics into the truncated plan, and
  * since the state feeds k places in the next step's plan, the estimated
  * `sizeInBytes` BigInt compounds to (2^63)^(k^step) — its digit count grows
  * exponentially with the superstep count and stats estimation eventually
  * pins the driver in million-digit BigInteger multiplication (observed as a
  * multi-minute "hang" at ~10 supersteps for k=4). [[checkpoint]] truncates
  * BOTH lineage and statistics; join strategy for the state side is then
  * AQE's runtime decision, which is what a long-running job wants anyway.
  */
object Superstep {

  /** Drop-in replacement for `df.localCheckpoint(eager)` on loop-carried
    * state. `eager = false` keeps the one-job-per-superstep discipline (the
    * caller's combined aggregate materializes the checkpoint). */
  def checkpoint(df: DataFrame, eager: Boolean = false): DataFrame =
    GraftShim.localCheckpointResetStats(df, eager)

  /** [[checkpoint]] plus a thunk that unpersists the checkpointed blocks.
    * Superstep loops should release step k−1 RIGHT AFTER step k's state has
    * materialized (and never release the final state a caller will read):
    * left to the ContextCleaner, dead superstep blocks pile up for the whole
    * run — under a large heap the cleaner barely runs, and memory-store
    * churn makes late supersteps measurably slower (observed 9 s → 21 s by
    * superstep 9 on a 19 M-edge PageRank). */
  def checkpointReleasable(df: DataFrame, eager: Boolean = false): (DataFrame, () => Unit) =
    GraftShim.localCheckpointResetStatsReleasable(df, eager)
}
