package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

import graft.graph.PageRank
import graft.ingest.{Dictionary, LinkExtract, PageSynth}

/** Two-parallelism scaling evidence for the BASELINE.json north rule
  * (no real cluster in this sandbox): run the SAME PageRank-to-convergence
  * job on the SAME deterministic synthetic link graph at local[N] and
  * local[4N], shuffle partitions scaled with cores, and report
  * edges·supersteps/sec at both plus scaling efficiency
  * (T_N / T_4N) / 4 — target ≥ 0.8.
  *
  * Usage: runMain graft.ScalingBench [nPages] [runs] [lowCores] [highCores]
  * Writes a row-set to BENCH_SCALING.md and prints one JSON line.
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 1000000L
    val runs = if (args.length > 1) args(1).toInt else 3
    val lo = if (args.length > 2) args(2).toInt else 8
    val hi = if (args.length > 3) args(3).toInt else 32
    val supersteps = if (args.length > 4) args(4).toInt else 12
    val tmp = Files.createTempDirectory("graft-scale").toString
    val edgePath = s"$tmp/edges"

    // Materialize the deterministic edge table once (untimed; generation
    // parallelism does not affect the timed runs — the table is read back
    // from parquet by each session).
    var nEdges = 0L
    withSession(hi) { spark =>
      val pages = PageSynth.pages(spark, nPages, seed = 42L, numPartitions = 64)
      val edges = LinkExtract.edges(pages)
      val dict = Dictionary.buildSorted(
        edges.selectExpr("src as object").union(edges.selectExpr("dst as object")), "object")
      Dictionary.encodeEdges(edges, dict)
        .select("src", "dst")
        .repartition(64)
        .write.mode("overwrite").parquet(edgePath)
      nEdges = spark.read.parquet(edgePath).count()
    }

    // Fixed superstep count (tol=0 never converges early): both parallelism
    // levels execute the identical superstep sequence, so the ratio of wall
    // times is a pure throughput comparison.
    def timed(cores: Int): (Double, Int) = {
      var medianSec = 0.0
      var iters = 0
      withSession(cores) { spark =>
        val edges = spark.read.parquet(edgePath)
        // warm-up (discarded)
        PageRank.run(spark, edges, tol = 0.0, maxIter = supersteps)
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val r = PageRank.run(spark, edges, tol = 0.0, maxIter = supersteps)
          iters = r.iterations
          (System.nanoTime() - t0) / 1e9
        }.sorted
        medianSec = times(times.length / 2)
      }
      (medianSec, iters)
    }

    val (tLo, itLo) = timed(lo)
    val (tHi, itHi) = timed(hi)
    require(itLo == itHi, s"iteration counts differ: $itLo vs $itHi")

    val epsLo = nEdges.toDouble * itLo / tLo
    val epsHi = nEdges.toDouble * itHi / tHi
    val eff = (tLo / tHi) / (hi.toDouble / lo)

    val md =
      f"""
         |## ScalingBench result (${java.time.Instant.now})
         |
         || run | parallelism | shuffle parts | PageRank wall (median of $runs) | supersteps | edges·supersteps/sec | per core |
         ||---|---|---|---|---|---|---|
         || A | local[$lo] | $lo | $tLo%.2f s | $itLo | ${epsLo / 1e6}%.2f M | ${epsLo / 1e6 / lo}%.3f M |
         || B | local[$hi] | $hi | $tHi%.2f s | $itHi | ${epsHi / 1e6}%.2f M | ${epsHi / 1e6 / hi}%.3f M |
         |
         |graph: $nPages pages, $nEdges edges (PageSynth seed=42, power-law out-degree);
         |fixed $supersteps supersteps (identical jobs both levels), damping 0.85;
         |AQE on (coalescing off — see source), localCheckpoint per superstep.
         |**Scaling efficiency (T_A/T_B)/(${hi / lo}) = $eff%.3f** (target >= 0.8).
         |""".stripMargin
    Files.write(Paths.get("BENCH_SCALING.md"), md.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    println(
      f"""{"metric":"pagerank_scaling_efficiency","value":$eff%.3f,"unit":"ratio","lo_cores":$lo,"hi_cores":$hi,"lo_sec":$tLo%.2f,"hi_sec":$tHi%.2f,"edges":$nEdges,"supersteps":$itLo,"lo_eps":$epsLo%.0f,"hi_eps":$epsHi%.0f}""")
  }

  private def withSession(cores: Int)(f: SparkSession => Unit): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      // Partition coalescing would collapse both levels to the same few
      // post-shuffle partitions on a modest graph, erasing the parallelism
      // difference this benchmark exists to measure. Skew handling stays on.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try f(spark) finally spark.stop()
  }
}
