package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** SALSA (Lempel & Moran 2000, "The stochastic approach for link-structure
  * analysis") — the third canonical web link-analysis operator beside
  * PageRank and HITS. Two independent random walks on the bipartite
  * hub/authority view of the directed edge set:
  *
  *   authority chain: a →(back along a uniform in-edge)→ h
  *                      →(forward along a uniform out-edge)→ a′
  *   hub chain:       h →(forward)→ a →(back)→ h′
  *
  * Unlike HITS, each step is degree-NORMALIZED (a true Markov chain), which
  * famously makes SALSA robust to the tightly-knit-community (TKC) effect
  * that lets link farms capture HITS scores — directly relevant on a crawl
  * graph. This runs the power iteration for a fixed superstep count from
  * the uniform distribution over each side's support (reference-style
  * fixed-schedule semantics — bounded-depth SQL replays stay aligned, and
  * the L1 mass is conserved by the chain so no per-iteration renormalize
  * is needed).
  *
  * Superstep shape: per iteration each chain is two equi-joins against the
  * once-persisted edge table with map-side partial sums — Θ(E) messages,
  * no windows, no driver round-trips; loop state goes through
  * [[graft.core.Superstep.checkpointReleasable]] so iteration t−1's blocks
  * free as soon as t materializes. At warehouse scale the two joins hit
  * src- and dst-keyed exchanges; storing the edge table twice via
  * [[graft.sources.BucketedEdges]] (bucketed by src and by dst) makes all
  * four joins per iteration exchange-free.
  */
object Salsa {

  /** @param edges (src, dst) directed; duplicates/self-loops kept as-is
    *              (multi-edges weight the walk, faithful to the chain).
    * @return (vertex, salsa_hub, salsa_authority): the chain distributions
    *         after `iterations` steps, 0.0 off each side's support. */
  def run(spark: SparkSession, edges: DataFrame, iterations: Int = 8): DataFrame = {
    require(iterations >= 1, s"need iterations >= 1, got $iterations")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    e.count()

    val outd = e.groupBy(col("src").as("vertex")).agg(count(lit(1)).as("od"))
      .localCheckpoint(true)
    val ind = e.groupBy(col("dst").as("vertex")).agg(count(lit(1)).as("id"))
      .localCheckpoint(true)
    val nH = outd.count()
    val nA = ind.count()
    val vertices = outd.select("vertex").union(ind.select("vertex")).distinct()
      .localCheckpoint(true)

    if (nH == 0L || nA == 0L) {
      e.unpersist(blocking = false)
      return vertices.select(col("vertex"),
        lit(0.0).as("salsa_hub"), lit(0.0).as("salsa_authority"))
    }

    var auth = ind.select(col("vertex"), lit(1.0 / nA).as("s")).localCheckpoint(true)
    var hub = outd.select(col("vertex"), lit(1.0 / nH).as("s")).localCheckpoint(true)
    var releasePrev: () => Unit = () => ()

    for (_ <- 1 to iterations) {
      // authority chain: contribution s/indeg flows back to hubs, is
      // outdeg-normalized there, and flows forward to authorities
      val ca = auth.join(ind, "vertex").select(col("vertex").as("a"), (col("s") / col("id")).as("c"))
      val hc = e.join(ca, e("dst") === ca("a"))
        .groupBy(e("src").as("h")).agg(sum(col("c")).as("hv"))
        .join(outd.select(col("vertex").as("h"), col("od")), "h")
        .select(col("h"), (col("hv") / col("od")).as("c"))
      val authNext = e.join(hc, e("src") === hc("h"))
        .groupBy(e("dst").as("vertex")).agg(sum(col("c")).as("s"))

      // hub chain: the mirror image (forward first, then back)
      val ch = hub.join(outd, "vertex").select(col("vertex").as("h"), (col("s") / col("od")).as("c"))
      val ac = e.join(ch, e("src") === ch("h"))
        .groupBy(e("dst").as("a")).agg(sum(col("c")).as("av"))
        .join(ind.select(col("vertex").as("a"), col("id")), "a")
        .select(col("a"), (col("av") / col("id")).as("c"))
      val hubNext = e.join(ac, e("dst") === ac("a"))
        .groupBy(e("src").as("vertex")).agg(sum(col("c")).as("s"))

      val (aCk, relA) = graft.core.Superstep.checkpointReleasable(authNext, eager = true)
      val (hCk, relH) = graft.core.Superstep.checkpointReleasable(hubNext, eager = true)
      releasePrev()
      releasePrev = () => { relA(); relH() }
      auth = aCk; hub = hCk
    }

    val scores = vertices
      .join(hub.select(col("vertex"), col("s").as("salsa_hub")), Seq("vertex"), "left")
      .join(auth.select(col("vertex"), col("s").as("salsa_authority")), Seq("vertex"), "left")
      .select(col("vertex"),
        coalesce(col("salsa_hub"), lit(0.0)).as("salsa_hub"),
        coalesce(col("salsa_authority"), lit(0.0)).as("salsa_authority"))
    e.unpersist(blocking = false)
    scores
  }
}
