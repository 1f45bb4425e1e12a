package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

import graft.graph.PageRank
import graft.ingest.{Dictionary, LinkExtract, PageSynth}

/** Two-parallelism scaling evidence for the BASELINE.json north rule
  * (no real cluster in this sandbox): run the SAME PageRank job on the SAME
  * deterministic synthetic link graph at local[N] and local[4N], shuffle
  * partitions scaled with cores, and report edges·supersteps/sec at both
  * plus scaling efficiency (T_N / T_4N) / 4 — target ≥ 0.8.
  *
  * Measurement protocol (round-3 rework, after the round-2 verdict judged
  * the sequential-block evidence inconclusive on a noisy shared host):
  *
  *  - INTERLEAVED A/B repeats: each rep times one lo-core run then one
  *    hi-core run back-to-back, so host drift across the session hits both
  *    sides of every per-rep ratio instead of biasing one block;
  *  - median + IQR of the per-rep efficiencies (paired ratios), plus the
  *    efficiency of the median walls;
  *  - per-superstep decomposition from [[PageRank.Result.stepSeconds]]:
  *    the FIRST superstep carries one-off cost (codegen compile, shuffle
  *    service spin-up, first-touch page faults) that is constant in cores
  *    — on a fixed-superstep run it dilutes efficiency without saying
  *    anything about scaling — so the steady-state efficiency over
  *    supersteps ≥ 2 is reported next to the whole-run number.
  *
  * Usage: runMain graft.ScalingBench [nPages] [reps] [lowCores] [highCores]
  *        [supersteps]
  * Appends a section to BENCH_SCALING.md and prints one JSON line.
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 4000000L
    val reps = if (args.length > 1) args(1).toInt else 5
    val lo = if (args.length > 2) args(2).toInt else 4
    val hi = if (args.length > 3) args(3).toInt else 16
    val supersteps = if (args.length > 4) args(4).toInt else 10
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

    // One timed run at `cores`: fresh session, short warm-up run (JIT/
    // codegen; discarded), then ONE full fixed-superstep run (tol=0 never
    // converges early — both levels execute the identical job DAG).
    def timedRun(cores: Int): (Double, Seq[Double]) = {
      var wall = 0.0
      var steps: Seq[Double] = Nil
      withSession(cores) { spark =>
        val edges = spark.read.parquet(edgePath)
        PageRank.run(spark, edges, tol = 0.0, maxIter = 3) // warm-up, discarded
        val t0 = System.nanoTime()
        val r = PageRank.run(spark, edges, tol = 0.0, maxIter = supersteps)
        wall = (System.nanoTime() - t0) / 1e9
        require(r.iterations == supersteps, s"expected $supersteps supersteps, ran ${r.iterations}")
        steps = r.stepSeconds
      }
      (wall, steps)
    }

    // 1-min load average minus our own expected core use — an honest tag
    // for reps polluted by EXTERNAL host load (this box is shared; a
    // co-tenant stealing cores hits the wide run harder and biases the
    // ratio down, so reps are reported with the load they ran under)
    def loadavg(): Double =
      scala.util.Try(java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble).getOrElse(-1.0)

    val pairs = (1 to reps).map { rep =>
      val l0 = loadavg()
      val (tLo, sLo) = timedRun(lo)
      val (tHi, sHi) = timedRun(hi)
      val l1 = loadavg()
      val eff = (tLo / tHi) / (hi.toDouble / lo)
      println(f"[scaling] rep$rep lo=$tLo%.2fs hi=$tHi%.2fs eff=$eff%.3f " +
        f"(first-step lo=${sLo.head}%.2f hi=${sHi.head}%.2f; loadavg $l0%.1f→$l1%.1f)")
      (tLo, tHi, sLo, sHi, math.max(l0, l1))
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def quartiles(xs: Seq[Double]): (Double, Double) = {
      val s = xs.sorted; (s((s.size - 1) / 4), s(3 * (s.size - 1) / 4))
    }

    val effs = pairs.map { case (a, b, _, _, _) => (a / b) / (hi.toDouble / lo) }
    val loads = pairs.map(_._5)
    val effMed = median(effs)
    val (effQ1, effQ3) = quartiles(effs)
    val tLoMed = median(pairs.map(_._1))
    val tHiMed = median(pairs.map(_._2))
    val effOfMedians = (tLoMed / tHiMed) / (hi.toDouble / lo)

    // steady-state: drop the first two supersteps of every run (superstep 0
    // pays codegen/first-touch; superstep 1 can still hit lazy init); the
    // per-superstep series is driver-observed wall per loop iteration
    val ssLo = pairs.flatMap(_._3.drop(2))
    val ssHi = pairs.flatMap(_._4.drop(2))
    val ssEff = (median(ssLo) / median(ssHi)) / (hi.toDouble / lo)
    val firstLo = median(pairs.map(_._3.head))
    val firstHi = median(pairs.map(_._4.head))

    val epsLo = nEdges.toDouble * supersteps / tLoMed
    val epsHi = nEdges.toDouble * supersteps / tHiMed

    val md =
      f"""
         |## ScalingBench result (${java.time.Instant.now}) — interleaved A/B protocol
         |
         || run | parallelism | shuffle parts | PageRank wall (median of $reps interleaved) | supersteps | edges·supersteps/sec | per core |
         ||---|---|---|---|---|---|---|
         || A | local[$lo] | $lo | $tLoMed%.2f s | $supersteps | ${epsLo / 1e6}%.2f M | ${epsLo / 1e6 / lo}%.3f M |
         || B | local[$hi] | $hi | $tHiMed%.2f s | $supersteps | ${epsHi / 1e6}%.2f M | ${epsHi / 1e6 / hi}%.3f M |
         |
         |graph: $nPages pages, $nEdges edges (PageSynth seed=42, power-law out-degree);
         |fixed $supersteps supersteps (identical jobs both levels), damping 0.85;
         |AQE on (coalescing off — see source), localCheckpoint per superstep.
         |Per-rep paired efficiencies: ${effs.map(e => f"$e%.3f").mkString(", ")}
         |Per-rep max 1-min loadavg (our own lo/hi use is $lo–$hi cores; anything
         |beyond that is external co-tenant load): ${loads.map(l => f"$l%.1f").mkString(", ")}
         |**Efficiency median = $effMed%.3f** (IQR $effQ1%.3f–$effQ3%.3f; of-medians $effOfMedians%.3f; target >= 0.8).
         |Per-superstep decomposition: first superstep $firstLo%.2f s (lo) / $firstHi%.2f s (hi)
         |— one-off codegen/first-touch cost, ~constant in cores — vs steady-state
         |median superstep ${median(ssLo)}%.2f s (lo) / ${median(ssHi)}%.2f s (hi):
         |**steady-state efficiency = $ssEff%.3f**.
         |""".stripMargin
    Files.write(Paths.get("BENCH_SCALING.md"), md.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    println(
      f"""{"metric":"pagerank_scaling_efficiency","value":$effMed%.3f,"unit":"ratio","lo_cores":$lo,"hi_cores":$hi,"lo_sec":$tLoMed%.2f,"hi_sec":$tHiMed%.2f,"edges":$nEdges,"supersteps":$supersteps,"eff_iqr":[$effQ1%.3f,$effQ3%.3f],"eff_steady":$ssEff%.3f,"lo_eps":$epsLo%.0f,"hi_eps":$epsHi%.0f}""")
  }

  private def withSession(cores: Int)(f: SparkSession => Unit): Unit = {
    val builder = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      // Partition coalescing would collapse both levels to the same few
      // post-shuffle partitions on a modest graph, erasing the parallelism
      // difference this benchmark exists to measure. Skew handling stays on.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // Shuffle spill dir on tmpfs: this box's /tmp is one virtio disk whose
    // bandwidth is CONSTANT in cores — shuffle I/O on it shows up as a
    // serial term in T(c) = S + P/c and caps measured efficiency. A real
    // N→4N cluster brings N× local disks, so the shared-disk term is a
    // single-box artifact this benchmark must not measure. 126 GB tmpfs,
    // ~1-2 GB live shuffle per superstep: fits trivially. Gated on the
    // directory existing and being writable (absent on e.g. macOS — fall
    // back to the default spark.local.dir and SAY so, since the shared-disk
    // serial term then caps the measurement).
    val shm = new java.io.File("/dev/shm")
    val spark = (if (shm.isDirectory && shm.canWrite)
        builder.config("spark.local.dir", "/dev/shm/graft-shuffle")
      else {
        System.err.println("[scaling] /dev/shm unavailable: shuffle stays on the default " +
          "local dir — expect a shared-disk serial term in the measured efficiency")
        builder
      })
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try f(spark) finally spark.stop()
  }
}
