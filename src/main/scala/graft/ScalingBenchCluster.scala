package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

import graft.graph.PageRank
import graft.ingest.{Dictionary, LinkExtract, PageSynth}

/** N→4N EXECUTOR scaling evidence via Spark's `local-cluster[n, cores, mem]`
  * master: REAL separate executor JVMs on this box — the closest sandbox
  * shape to the north rule's "multi-executor cluster at N and 4N executors"
  * that exists without a second machine.
  *
  * Why this exists next to [[ScalingBench]] (local[k] threads): with
  * local[k], BOTH parallelism levels share one JVM heap, one GC, one
  * block manager — a serial term that exists only because the sandbox packs
  * all "executors" into one process. Round 3 fit that term (S ≈ 0.65 s/
  * superstep) and ARGUED a real cluster does not share it; this benchmark
  * MEASURES the same claim instead: 1 executor (own 10g heap) vs
  * 4 executors (own 10g heap each) — per-executor heap, GC
  * threads, and shuffle-IO threads now scale with N exactly as they do on
  * a real cluster, while the remaining shared substrate (one memory bus,
  * one kernel) is the irreducible price of a one-box sandbox.
  *
  * Same interleaved A/B protocol as ScalingBench: per-rep lo/hi pairs
  * back-to-back, median + IQR of paired efficiencies, steady-state
  * per-superstep decomposition (drop the first two supersteps), per-rep
  * loadavg tags.
  *
  * Executor processes need the app classes: run `sbt package` first; the
  * jar is shipped via spark.jars. `spark.test.home` (→ SPARK_HOME or
  * /opt/spark) lets the in-process Worker spawn executor JVMs from the
  * installed distribution.
  *
  * Usage (the two env vars are read by Spark's executor-command builder,
  * which only sees process ENV — they cannot be set from code):
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *     sbt -batch "runMain graft.ScalingBenchCluster [nPages] [reps]
  *       [loExecs] [hiExecs] [supersteps] [coresPerExec]"
  * (defaults 8000000 5 1 4 10 4; 10g heap per executor; set
  * SPARK_LOCAL_DIRS=/dev/shm/graft-shuffle too — standalone executors take
  * their shuffle dirs from env, not spark.local.dir)
  */
object ScalingBenchCluster {

  private val WorkerMemMb = 12288
  private val ExecMem = "10g"
  /** Cores per executor (arg 6). Default 4: with 1 vs 4 executors that is
    * 4 vs 16 cores — the SAME core counts as the local[k] campaigns, and
    * it leaves half the box as headroom for the driver/GC/OS. 4N executors
    * at full machine width (8 cores each) measures box SATURATION, not
    * plan scaling: measured loadavg 28 on 32 cores and efficiency collapsed
    * to 0.5–0.64 — a co-tenancy artifact a real cluster never has, so the
    * default keeps the benchmark inside the regime where the two levels
    * compete for compute, not for the whole machine. */
  private var coresPerExec = 4

  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 8000000L
    val reps = if (args.length > 1) args(1).toInt else 5
    val lo = if (args.length > 2) args(2).toInt else 1
    val hi = if (args.length > 3) args(3).toInt else 4
    val supersteps = if (args.length > 4) args(4).toInt else 10
    if (args.length > 5) coresPerExec = args(5).toInt

    sys.props.getOrElseUpdate("spark.test.home",
      sys.env.getOrElse("SPARK_HOME", "/opt/spark"))
    require(sys.env.contains("SPARK_HOME") && sys.env.contains("SPARK_SCALA_VERSION"),
      "local-cluster executors are spawned through the launcher library, which " +
        "reads SPARK_HOME and SPARK_SCALA_VERSION from process env: invoke as " +
        "SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 sbt ... (see scaladoc)")
    val jar = sys.env.getOrElse("SPARK_GRAFT_JAR",
      "target/scala-2.13/clustyspark_2.13-0.1.0.jar")
    require(Files.exists(Paths.get(jar)), s"run `sbt package` first: $jar missing")

    val tmp = Files.createTempDirectory("graft-scale-cluster").toString
    val edgePath = s"$tmp/edges"
    var nEdges = 0L
    withSession(hi, jar) { spark =>
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

    def timedRun(execs: Int): (Double, Seq[Double]) = {
      var wall = 0.0
      var steps: Seq[Double] = Nil
      withSession(execs, jar) { spark =>
        val edges = spark.read.parquet(edgePath)
        PageRank.run(spark, edges, tol = 0.0, maxIter = 3) // warm-up, discarded
        val t0 = System.nanoTime()
        val r = PageRank.run(spark, edges, tol = 0.0, maxIter = supersteps)
        wall = (System.nanoTime() - t0) / 1e9
        require(r.iterations == supersteps)
        steps = r.stepSeconds
      }
      (wall, steps)
    }

    def loadavg(): Double =
      scala.util.Try(Files.readString(Paths.get("/proc/loadavg"))
        .split(" ")(0).toDouble).getOrElse(-1.0)

    val ratio = hi.toDouble / lo
    val pairs = (1 to reps).map { rep =>
      val l0 = loadavg()
      val (tLo, sLo) = timedRun(lo)
      val (tHi, sHi) = timedRun(hi)
      val l1 = loadavg()
      val eff = (tLo / tHi) / ratio
      println(f"[scaling-cluster] rep$rep lo($lo execs)=$tLo%.2fs hi($hi execs)=$tHi%.2fs " +
        f"eff=$eff%.3f (first-step lo=${sLo.head}%.2f hi=${sHi.head}%.2f; loadavg $l0%.1f→$l1%.1f)")
      (tLo, tHi, sLo, sHi, math.max(l0, l1))
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def quartiles(xs: Seq[Double]): (Double, Double) = {
      val s = xs.sorted; (s((s.size - 1) / 4), s(3 * (s.size - 1) / 4))
    }

    val effs = pairs.map { case (a, b, _, _, _) => (a / b) / ratio }
    val (effQ1, effQ3) = quartiles(effs)
    val effMed = median(effs)
    val tLoMed = median(pairs.map(_._1))
    val tHiMed = median(pairs.map(_._2))
    val ssLo = pairs.flatMap(_._3.drop(2))
    val ssHi = pairs.flatMap(_._4.drop(2))
    val ssEff = (median(ssLo) / median(ssHi)) / ratio
    val epsLo = nEdges.toDouble * supersteps / tLoMed
    val epsHi = nEdges.toDouble * supersteps / tHiMed

    val md =
      f"""
         |## ScalingBenchCluster result (${java.time.Instant.now}) — N vs 4N REAL EXECUTOR JVMs (local-cluster)
         |
         || run | executors × cores | per-exec heap | PageRank wall (median of $reps interleaved) | supersteps | edges·supersteps/sec | per core |
         ||---|---|---|---|---|---|---|
         || A | $lo × $coresPerExec | $ExecMem | $tLoMed%.2f s | $supersteps | ${epsLo / 1e6}%.2f M | ${epsLo / 1e6 / (lo * coresPerExec)}%.3f M |
         || B | $hi × $coresPerExec | $ExecMem | $tHiMed%.2f s | $supersteps | ${epsHi / 1e6}%.2f M | ${epsHi / 1e6 / (hi * coresPerExec)}%.3f M |
         |
         |graph: $nPages pages, $nEdges edges (PageSynth seed=42); fixed $supersteps supersteps;
         |separate executor JVMs (per-executor heap/GC/shuffle threads scale with N —
         |the substrate term local[k] could not separate); shuffle partitions = total cores.
         |Per-rep paired efficiencies: ${effs.map(e => f"$e%.3f").mkString(", ")}
         |Per-rep max 1-min loadavg: ${pairs.map(p => f"${p._5}%.1f").mkString(", ")}
         |**Efficiency median = $effMed%.3f** (IQR $effQ1%.3f–$effQ3%.3f; target >= 0.8).
         |Steady-state superstep medians: ${median(ssLo)}%.2f s (lo) / ${median(ssHi)}%.2f s (hi) →
         |**steady-state efficiency = $ssEff%.3f**.
         |""".stripMargin
    Files.write(Paths.get("BENCH_SCALING.md"), md.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    println(
      f"""{"metric":"pagerank_scaling_efficiency_cluster","value":$effMed%.3f,"unit":"ratio","lo_execs":$lo,"hi_execs":$hi,"cores_per_exec":$coresPerExec,"lo_sec":$tLoMed%.2f,"hi_sec":$tHiMed%.2f,"edges":$nEdges,"supersteps":$supersteps,"eff_iqr":[$effQ1%.3f,$effQ3%.3f],"eff_steady":$ssEff%.3f}""")
  }

  private def withSession(execs: Int, jar: String)(f: SparkSession => Unit): Unit = {
    val totalCores = execs * coresPerExec
    val builder = SparkSession.builder()
      .master(s"local-cluster[$execs,$coresPerExec,$WorkerMemMb]")
      .appName(s"graft-scaling-cluster-$execs")
      .config("spark.jars", jar)
      .config("spark.executor.memory", ExecMem)
      .config("spark.sql.shuffle.partitions", totalCores)
      .config("spark.default.parallelism", totalCores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val shm = new java.io.File("/dev/shm")
    val spark = (if (shm.isDirectory && shm.canWrite)
        builder.config("spark.local.dir", "/dev/shm/graft-shuffle")
      else builder)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try f(spark) finally spark.stop()
  }
}
