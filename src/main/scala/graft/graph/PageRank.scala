package graft.graph

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
  *  - the per-vertex state `(vertex, dangling, rank)` is hash-partitioned on
  *    `vertex` by construction, so both per-superstep joins (ranks→links,
  *    contribs→state) reuse partitionings instead of re-shuffling the state.
  *  - **one Spark job per superstep**: the new state is `localCheckpoint`ed
  *    lazily and materialized by a single combined aggregate that returns
  *    both the convergence delta (`max |rank − old_rank|`) and the *next*
  *    superstep's dangling mass (`sum(rank where dangling)`). Dangling-ness
  *    is a precomputed boolean on the state, not a per-step anti-join.
  *  - checkpointing truncates lineage to O(1) per superstep and is the
  *    resumable frontier state (on a cluster this becomes a write to an
  *    Iceberg/parquet `ranks_step_k` table; same contract).
  *  - convergence = `max(abs(delta)) < tol`; both our runs and the in-test
  *    oracle converge to the same epsilon so float-sum reorder noise stays
  *    below the compare tolerance.
  */
object PageRank {

  /** @param stepSeconds wall seconds of each executed superstep (plan build
    *   + the materializing aggregate action) — the raw series behind the
    *   scaling bench's first-step vs steady-state decomposition. */
  final case class Result(ranks: DataFrame, iterations: Int, converged: Boolean,
                          stepSeconds: Seq[Double] = Nil)

  /** @param edges (src: Long, dst: Long) directed; parallel edges allowed
    *              (they weight the transition like multi-links).
    * @param stateDir when set, every superstep's (vertex, dangling, rank)
    *              state is committed durably under `stateDir/step=k` with
    *              per-partition metrics, and a re-run with the same dir
    *              RESUMES from the last committed superstep instead of
    *              starting over (north-rule resumability; parquet standing
    *              in for an Iceberg table).
    * @return ranks (vertex: Long, rank: Double), sum(rank) == 1 (±fp noise).
    */
  def run(spark: SparkSession, edges: DataFrame, damping: Double = 0.85,
          tol: Double = 1e-8, maxIter: Int = 100,
          stateDir: Option[String] = None,
          weightCol: Option[String] = None,
          seeds: Option[DataFrame] = None): Result = {
    // unweighted: every edge weighs 1; weighted: transition probability
    // proportional to the edge weight (share = w / Σ out-weights)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0)).as("w"))

    // Pre-divide: contribution factor per edge = w/Σw(src). ONE exchange
    // builds the whole table: repartition on src, then out-degree as a
    // window sum over the src partition (WindowExec only sorts within the
    // already-co-located partition — no second shuffle, unlike the previous
    // groupBy(outdeg) + join + repartition chain, which exchanged the big
    // edge table twice and the degree table once). Partitioned on src once;
    // the big side never moves again across supersteps.
    val wSrc = org.apache.spark.sql.expressions.Window.partitionBy("src")
    val links = e.repartition(col("src"))
      .select(col("src"), col("dst"),
        (col("w") / sum(col("w")).over(wSrc)).as("share"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    links.count() // materialize once

    val ckpt = stateDir.map(new RankCheckpointer(spark, _))
    val resumeStep = ckpt.map(_.latestStep()).getOrElse(-1)

    // State (vertex, dangling, tele, rank) — dangling flag and teleport
    // weight computed once, not per step. tele is the teleport distribution:
    // uniform 1/n, or (personalized) 1/|seeds| on the seed set and 0
    // elsewhere; dangling mass is redistributed by tele, so uniform
    // PageRank is exactly the seeds=None special case.
    // Vertex set + dangling flag in ONE partial-aggregated shuffle (dangling
    // = never appears as src), replacing the previous distinct-union +
    // left-join-with-degrees pair of exchanges.
    val st0base = e.select(col("src").as("vertex"), lit(true).as("_has_out"))
      .unionByName(e.select(col("dst").as("vertex"), lit(false).as("_has_out")))
      .groupBy(col("vertex")).agg(max(col("_has_out")).as("_has_out"))
      .select(col("vertex"), (!col("_has_out")).as("dangling"))
    val st0pre = seeds match {
      case None => st0base.withColumn("seed", lit(false))
      case Some(sd) =>
        val sv = sd.select(col(sd.columns.head).cast("long").as("vertex")).distinct()
          .withColumn("_is_seed", lit(true))
        st0base.join(sv, Seq("vertex"), "left")
          .select(col("vertex"), col("dangling"),
            coalesce(col("_is_seed"), lit(false)).as("seed"))
    }
    // Checkpoint (vertex, dangling, seed) ONCE: the scalar aggregate below
    // and the initial rank state both read it — previously each triggered
    // its own full recomputation of the union+aggregate pipeline (two jobs
    // where one suffices). Released after superstep 0 materializes, via the
    // releasePrev chain.
    val (st0, relSt0) = graft.core.Superstep.checkpointReleasable(st0pre, eager = true)
    val r0: Row = st0
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("dangling"), lit(1L)).otherwise(lit(0L))), lit(0L)).as("nd"),
        coalesce(sum(when(col("seed"), lit(1L)).otherwise(lit(0L))), lit(0L)).as("ns"),
        coalesce(sum(when(col("dangling") && col("seed"), lit(1L)).otherwise(lit(0L))), lit(0L)).as("nds"))
      .head()
    val n = r0.getLong(0)
    val nSeeds = r0.getLong(2)
    require(seeds.isEmpty || nSeeds > 0, "personalized PageRank needs >= 1 seed present in the graph")

    val teleCol =
      if (seeds.isEmpty) lit(1.0 / n)
      else when(col("seed"), lit(1.0 / nSeeds)).otherwise(lit(0.0))

    var danglingMass =
      if (seeds.isEmpty) r0.getLong(1).toDouble / n
      else r0.getLong(3).toDouble / nSeeds
    // initial state = narrow projection over the st0 checkpoint (no second
    // checkpoint copy — st0's blocks ARE the superstep-0 input, freed once
    // superstep 1 materializes via the releasePrev chain)
    var state =
      if (resumeStep >= 0) { relSt0(); ckpt.get.read(resumeStep) }
      else st0.select(col("vertex"), col("dangling"), teleCol.as("tele"),
        teleCol.as("rank"))
    var it = math.max(resumeStep + 1, 0)
    var converged = false
    if (resumeStep >= 0) ckpt.get.scalars(resumeStep).foreach { case (delta, carry) =>
      if (!carry.isNaN) danglingMass = carry
      if (!delta.isNaN) converged = delta < tol
    }

    val stepSecs = Vector.newBuilder[Double]
    // frees superstep k-1's checkpoint blocks once k is materialized; the
    // FINAL state is never released (the caller reads Result.ranks from it).
    // Superstep 0's "previous state" is the st0 checkpoint itself.
    var releasePrev: () => Unit = if (resumeStep >= 0) () => () else relSt0
    while (!converged && it < maxIter) {
      val loopT0 = System.nanoTime()
      // Pregel union-carrier: the state row rides along as a
      // zero-contribution message carrying (dangling, old_rank), so the new
      // state is ONE aggregation — no contribs→state join, no sort, and
      // every vertex is guaranteed present. Two exchanges per superstep:
      // ranks to the links partitioning, messages to the dst partitioning
      // (both partial-aggregated map-side, so hub fan-in skew is combined
      // before the wire).
      val msgs = links
        .join(state.select(col("vertex"), col("rank")), links("src") === col("vertex"))
        .select(col("dst"), (col("rank") * col("share")).as("contrib"),
          lit(null).cast("boolean").as("dangling"),
          lit(null).cast("double").as("tele"),
          lit(null).cast("double").as("old_rank"))
      val carrier = state.select(col("vertex").as("dst"), lit(0.0).as("contrib"),
        col("dangling"), col("tele"), col("rank").as("old_rank"))

      val stepT0 = System.nanoTime()
      // rank' = (1-d)·tele + d·in_mass + d·danglingMass·tele
      val next0 = msgs.unionByName(carrier)
        .groupBy(col("dst")).agg(
          sum(col("contrib")).as("in_mass"),
          first(col("dangling"), ignoreNulls = true).as("dangling"),
          first(col("tele"), ignoreNulls = true).as("tele"),
          first(col("old_rank"), ignoreNulls = true).as("old_rank"))
        .select(col("dst").as("vertex"), col("dangling"), col("tele"),
          (lit(1.0 - damping) * col("tele") + lit(damping) * col("in_mass")
            + lit(damping * danglingMass) * col("tele")).as("rank"),
          col("old_rank"))
      val (next, release) = ckpt match {
        case Some(c) => (c.write(it, next0), () => ()) // durable superstep barrier
        case None    => graft.core.Superstep.checkpointReleasable(next0) // materialized by the agg
      }

      val row = next.agg(
        max(abs(col("rank") - col("old_rank"))).as("delta"),
        coalesce(sum(when(col("dangling"), col("rank"))), lit(0.0)).as("dmass"))
        .head()
      val delta = row.getDouble(0)
      danglingMass = row.getDouble(1)
      ckpt.foreach(_.seal(it, (System.nanoTime() - stepT0) / 1e9, delta, danglingMass))

      // step-k state is fully materialized (the agg read every partition):
      // step k-1's checkpointed blocks are dead — free them NOW instead of
      // letting them pile up for the ContextCleaner (see Superstep scaladoc)
      releasePrev()
      releasePrev = release
      state = next.select(col("vertex"), col("dangling"), col("tele"), col("rank"))
      it += 1
      converged = delta < tol
      stepSecs += (System.nanoTime() - loopT0) / 1e9
    }
    links.unpersist(blocking = false)
    Result(state.select(col("vertex"), col("rank")), it, converged, stepSecs.result())
  }

  /** Undirected convenience: run on the symmetrized edge set. */
  def runUndirected(spark: SparkSession, edges: DataFrame, damping: Double = 0.85,
                    tol: Double = 1e-8, maxIter: Int = 100,
                    stateDir: Option[String] = None,
                    weightCol: Option[String] = None,
                    seeds: Option[DataFrame] = None): Result = {
    val keep = weightCol.toSeq.map(col)
    val bi = edges.select(Seq(col("src"), col("dst")) ++ keep: _*)
      .union(edges.select(Seq(col("dst").as("src"), col("src").as("dst")) ++ keep: _*))
    run(spark, bi, damping, tol, maxIter, stateDir, weightCol, seeds)
  }

  /** Personalized PageRank (random walk with restart to the seed set):
    * teleport and dangling redistribution go to the seeds instead of the
    * uniform vector. */
  def runPersonalized(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
                      damping: Double = 0.85, tol: Double = 1e-8,
                      maxIter: Int = 100): Result =
    run(spark, edges, damping, tol, maxIter, seeds = Some(seeds))
}
