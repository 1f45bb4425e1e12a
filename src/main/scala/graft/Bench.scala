package graft

import org.apache.spark.sql.SparkSession

import graft.graph.PageRank

/** Per-round benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR at local[SPARK_GRAFT_CPUS], prints exactly one JSON
  * line {"metric","value","unit","queries","sf"}.
  *
  * The headline set covers each engine area: edge build + graph algorithms
  * (the north-rule flagship), dedup, text, similarity, events.
  *
  * The BASELINE.json metric (edges processed/sec for PageRank-to-convergence)
  * is measured on the *full* co-occurrence graph (unthresholded — the
  * realistic dense case) with the actual superstep count from the run:
  * `directed_edges × supersteps / wall`. Cross-parallelism scaling evidence
  * lives in ScalingBench/BASELINE.md.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = Seq(
      "q_edges_build", "q_cc", "q_cluster_shape", "q_triangles",
      "q_pagerank", "q_lpa",
      "q_exact_dedup", "q_minhash_pairs", "q_simhash",
      "q_text_quality", "q_langid",
      "q_ann_topk", "q_embed_neardup",
      "q_sessions", "q_window_counts")

    // Warm-up: run the whole headline set once at sf0.001 before timing.
    // The recorded numbers are then steady-state operator cost, not
    // first-evaluation JIT/codegen of whichever query happens to run a
    // pipeline shape first — the round-3 q_langid "regression" was exactly
    // such a cold-start artifact (BASELINE.md round-4 attribution). ~10 s,
    // untimed, standard warmup-then-measure benchmarking discipline; the
    // timed sf run still pays all of its own real work (scans, cache
    // materialization, shuffles) at full scale.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      headline.foreach { name =>
        try SparkEntry.queries(name)(spark, warmDir)
          .write.mode("overwrite").format("noop").save()
        catch { case _: Throwable => () }
      }
      Queries.clearCaches() // drop the tiny warm-tier caches before timing
    } else spark.read.parquet(s"$sfDir/region.parquet").count()

    var results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -1.0)
    }

    // North-rule metric: PageRank-to-convergence on the full graph. The
    // edge table is materialized (persisted) up front so the metric times
    // the iterative job itself, not the co-occurrence extraction.
    val bi = Queries.edgesAll(spark, sfDir).select("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDirected = bi.count() * 2 // runUndirected symmetrizes
    val t0 = System.nanoTime()
    val pr = PageRank.runUndirected(spark, bi, tol = 1e-6, maxIter = 25)
    pr.ranks.write.mode("overwrite").format("noop").save()
    val prSec = (System.nanoTime() - t0) / 1e9
    val prEdgesPerSec = nDirected.toDouble * pr.iterations / prSec
    results = results :+ ("q_pagerank_full" -> prSec)
    bi.unpersist(blocking = false)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"pagerank_edges_per_sec":${f"$prEdgesPerSec%.0f"},"pagerank_directed_edges":$nDirected,"pagerank_supersteps":${pr.iterations}}""")
    Queries.clearCaches()
    spark.stop()
  }
}
