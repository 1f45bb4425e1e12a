package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cluster.{GreedyClustering, Shaping}
import graft.graph.{ConnectedComponents, Louvain}
import graft.ingest.{Dictionary, EdgeOps}
import graft.sources.{AssignmentsSink, EdgeTableSource}

/** The clusty-equivalent CLI entry point: one end-to-end run of
  * `graft.Main [options] <distances> <assignments>` mirrors
  * `clusty [options] <distances> <assignments>` (reference
  * src/params.cpp:22-123) — same flags, same dataflow
  * (edge-table scan → filters/transform → dictionary → clustering →
  * output shaping → assignments sink), composed from the engine's
  * distributed operators instead of the reference's in-memory pipeline.
  *
  * Supported options (names identical to the reference):
  *   --algo single|complete|uclust|set-cover|cd-hit|leiden
  *   --objects-file F            object universe + representativeness order
  *   --id-cols c1 c2             id columns (default: first two)
  *   --distance-col c            distance column (default: third)
  *   --similarity | --percent-similarity
  *   --min col v / --max col v   repeatable range filters (repeated --min on
  *                               a column keeps the max threshold, --max the
  *                               min — reference src/params.cpp:94-101)
  *   --numeric-ids
  *   --out-representatives
  *   --out-csv
  *   -v                          load report + distance histogram (A2/A5)
  *   --leiden-resolution x (0.7) / --leiden-iterations n — leiden maps to
  *     [[graft.graph.Louvain]]; --leiden-beta is accepted and ignored (our
  *     refinement is deterministic, no randomness knob).
  *
  * Determinism note: without an objects file the reference assigns local ids
  * in first-appearance order of the (single-threaded) edge stream; a
  * distributed scan has no such order, so ids come from the lexicographic
  * dictionary ([[Dictionary.buildSorted]]) — partitions are identical,
  * only tie-order among equal-sized clusters can differ. With an objects
  * file the ordering semantics match the reference exactly.
  */
object Main {

  final case class Filter(min: Double = Double.NegativeInfinity,
                          max: Double = Double.PositiveInfinity)

  final case class Config(
      distances: String = "",
      output: String = "",
      algo: String = "single",
      objectsFile: Option[String] = None,
      idCols: Option[(String, String)] = None,
      distanceCol: Option[String] = None,
      distanceKind: EdgeOps.DistanceKind = EdgeOps.RawDistance,
      filters: Map[String, Filter] = Map.empty,
      numericIds: Boolean = false,
      verbose: Boolean = false,
      outRepresentatives: Boolean = false,
      outCsv: Boolean = false,
      leidenResolution: Double = 0.7,
      leidenIterations: Int = 2)

  def parse(argv: Seq[String]): Config = {
    require(argv.length >= 2, usage)
    var cfg = Config()
    val args = argv.toBuffer
    def takeOpt(name: String): Option[String] = {
      val i = args.indexOf(name)
      if (i >= 0 && i + 1 < args.length - 2) { // last two args are positional
        val v = args(i + 1); args.remove(i, 2); Some(v)
      } else None
    }
    def takeOpt2(name: String): Option[(String, String)] = {
      val i = args.indexOf(name)
      if (i >= 0 && i + 2 < args.length - 2) {
        val v = (args(i + 1), args(i + 2)); args.remove(i, 3); Some(v)
      } else None
    }
    def takeFlag(name: String): Boolean = {
      val i = args.indexOf(name)
      if (i >= 0) { args.remove(i); true } else false
    }

    takeOpt("--algo").foreach(a => cfg = cfg.copy(algo = a))
    takeOpt("--objects-file").foreach(f => cfg = cfg.copy(objectsFile = Some(f)))
    takeOpt2("--id-cols").foreach(c => cfg = cfg.copy(idCols = Some(c)))
    takeOpt("--distance-col").foreach(c => cfg = cfg.copy(distanceCol = Some(c)))
    if (takeFlag("--percent-similarity")) cfg = cfg.copy(distanceKind = EdgeOps.PercentSimilarity)
    if (takeFlag("--similarity")) cfg = cfg.copy(distanceKind = EdgeOps.Similarity)
    var more = true
    while (more) takeOpt2("--min") match {
      case Some((c, v)) =>
        val f = cfg.filters.getOrElse(c, Filter())
        cfg = cfg.copy(filters = cfg.filters.updated(c, f.copy(min = math.max(f.min, v.toDouble))))
      case None => more = false
    }
    more = true
    while (more) takeOpt2("--max") match {
      case Some((c, v)) =>
        val f = cfg.filters.getOrElse(c, Filter())
        cfg = cfg.copy(filters = cfg.filters.updated(c, f.copy(max = math.min(f.max, v.toDouble))))
      case None => more = false
    }
    if (takeFlag("-v")) cfg = cfg.copy(verbose = true)
    takeOpt("-t") // thread count: accepted for script compatibility, ignored
                  // (parallelism is the Spark master/session's concern)
    if (takeFlag("--version")) println("graft (clusty-compatible CLI) 0.1.0")
    if (takeFlag("--numeric-ids")) cfg = cfg.copy(numericIds = true)
    if (takeFlag("--out-representatives")) cfg = cfg.copy(outRepresentatives = true)
    if (takeFlag("--out-csv")) cfg = cfg.copy(outCsv = true)
    takeOpt("--leiden-resolution").foreach(v => cfg = cfg.copy(leidenResolution = v.toDouble))
    takeOpt("--leiden-beta") // accepted, ignored (deterministic refinement)
    takeOpt("--leiden-iterations").foreach(v => cfg = cfg.copy(leidenIterations = v.toInt))

    // the two survivors must be the positionals, not leftover option tokens
    // (e.g. `--algo single` with no paths would otherwise "parse")
    require(args.length == 2 && !args.exists(_.startsWith("--")),
      s"expected <distances> <assignments>, got: ${args.mkString(" ")}\n$usage")
    cfg.copy(distances = args(0), output = args(1))
  }

  private val usage =
    "usage: graft.Main [--algo single|complete|uclust|set-cover|cd-hit|leiden] " +
      "[--objects-file F] [--id-cols c1 c2] [--distance-col c] [--similarity] " +
      "[--percent-similarity] [--min col v]... [--max col v]... [--numeric-ids] " +
      "[--out-representatives] [--out-csv] [-v] <distances> <assignments>"

  /** The reference tokenizes on both ',' and tab; a distributed reader needs
    * ONE separator, so sniff it from the header line. */
  private def sniffSep(spark: SparkSession, path: String): String = {
    val head = spark.sparkContext.textFile(path).first()
    if (head.contains("\t")) "\t" else ","
  }

  /** End-to-end clustering run; returns the final assignments frame in
    * output order — (object, cluster) or (object, cluster_rep, cluster) with
    * `--out-representatives`. Separated from [[main]] so tests can compare
    * results without touching the filesystem. */
  private def readOptions(spark: SparkSession, cfg: Config): EdgeTableSource.Options =
    EdgeTableSource.Options(
      sep = sniffSep(spark, cfg.distances),
      idCols = cfg.idCols,
      distanceCol = cfg.distanceCol,
      numericIds = cfg.numericIds,
      distanceKind = cfg.distanceKind,
      filters = cfg.filters.toSeq.sortBy(_._1).map { case (c, f) =>
        EdgeOps.RangeFilter(c,
          min = Option(f.min).filter(_.isFinite),
          max = Option(f.max).filter(_.isFinite))
      })

  def execute(spark: SparkSession, cfg: Config): DataFrame =
    execute(spark, cfg, EdgeTableSource.read(spark, cfg.distances, readOptions(spark, cfg)))

  /** Variant taking the already-read (and possibly cached) filtered edge
    * frame, so [[main]] can share ONE scan between the load report and the
    * clustering run instead of re-reading the distance table. */
  private[graft] def execute(spark: SparkSession, cfg: Config, rawEdges: DataFrame): DataFrame = {
    val opts = readOptions(spark, cfg)
    val universe = cfg.objectsFile.map(EdgeTableSource.readObjects(spark, _))

    // Dictionary: objects-file rank order when present (reference seeds
    // cluster ids in objects order, console.cpp:218/reorderObjects); without
    // one, FIRST-APPEARANCE order of the filtered edge stream — the
    // reference's sequential local ids (graph_named.h:215-247) — recovered
    // distributedly from line offsets so tie-breaks renumber identically.
    // Numeric mode: ids are already the vids (ordinals into the objects list
    // when given, reference README.md:217); the dictionary is then only a
    // DECODER (the reference prints objects-file NAMES, graph_numbered.h:322).
    val (enc, dict) = (cfg.numericIds, universe) match {
      case (true, Some(u)) =>
        (rawEdges, Some(Dictionary.buildFromRank(u)))
      case (true, None) =>
        val fa = EdgeTableSource.firstAppearanceRanks(spark, cfg.distances, opts)
        val d = fa.select(col("object").cast("long").as("object"), col("rank").as("vid"))
        (Dictionary.encodeEdges(rawEdges, d), Some(d))
      case (false, _) =>
        val d = universe.map(Dictionary.buildFromRank).getOrElse(
          Dictionary.buildFromRank(
            EdgeTableSource.firstAppearanceRanks(spark, cfg.distances, opts)))
        (Dictionary.encodeEdges(rawEdges, d), Some(d))
    }

    val ranks = universe match {
      // numeric mode: ordinal ids index the objects list; named mode:
      // vid == rank by buildFromRank — same projection either way
      case Some(u) => u.select(col("rank").as("vertex"), col("rank"))
      case None => enc.select(col("src").as("vertex")).union(enc.select(col("dst").as("vertex")))
        .distinct().select(col("vertex"), col("vertex").as("rank"))
    }

    val assignVid = cfg.algo match {
      case "single" =>
        ConnectedComponents.run(spark, enc).select(col("vertex"), col("component").as("cluster"))
      case "complete" =>
        GreedyClustering.completeLinkage(spark, enc).select(col("vertex"), col("cluster"))
      case "uclust" =>
        GreedyClustering.run(spark, enc, ranks, GreedyClustering.Uclust)
      case "set-cover" =>
        GreedyClustering.run(spark, enc, ranks, GreedyClustering.SetCover)
      case "cd-hit" =>
        GreedyClustering.run(spark, enc, ranks, GreedyClustering.CdHit)
      case "leiden" =>
        Louvain.run(spark, enc, resolution = cfg.leidenResolution,
            maxLevels = math.max(cfg.leidenIterations, 1) + 1)
          .assignment.select(col("vertex"), col("community").as("cluster"))
      case other => throw new IllegalArgumentException(s"unknown --algo $other\n$usage")
    }

    // decode vids → names, shape the output like the reference: size-renumber,
    // append universe singletons, order by (cluster, representativeness)
    val named = Dictionary.decode(assignVid, dict.get, vidCol = "vertex")
      .select(col("object"), col("cluster"))
    val renumbered = Shaping.renumberBySize(named).select(col("object"), col("cluster"))
    val full = universe match {
      case Some(u) => Shaping.appendSingletons(renumbered, u)
      case None => renumbered
    }
    universe match {
      case Some(u) =>
        val withRank = full.join(u, "object")
        if (cfg.outRepresentatives)
          Shaping.fillRepresentatives(withRank, rankCol = Some("rank"))
            .join(u, "object").orderBy(col("cluster"), col("rank"))
            .select(col("object"), col("cluster_rep"), col("cluster"))
        else withRank.orderBy(col("cluster"), col("rank")).select(col("object"), col("cluster"))
      case None =>
        // reference order: (cluster, name) named / (cluster, numeric id)
        // numeric — the numeric path keeps `object` as long, so one sort
        // expression serves both (graph_named.h:307, graph_numbered.h:306)
        if (cfg.outRepresentatives)
          Shaping.fillRepresentatives(full).orderBy(col("cluster"), col("object"))
            .select(col("object"), col("cluster_rep"), col("cluster"))
        else full.orderBy(col("cluster"), col("object"))
    }
  }

  /** The reference's load report (console.cpp:106-110: input/filtered
    * node+edge counts, printed at normal verbosity) and its `-v` distance
    * histogram (graph_sparse.h:122-150: 0.001-wide buckets to 0.05 plus an
    * overflow bucket over the TRANSFORMED distance) — the A2/A5 operators
    * surfaced through the CLI so a migrating clusty script keeps its load
    * diagnostics. Driver-dark by design (stdout diagnostics, not a catalog
    * row); the operators behind it are oracled via q_edge_stats /
    * q_weight_hist. */
  private def printLoadReport(spark: SparkSession, cfg: Config,
                              opts: EdgeTableSource.Options, filtered: DataFrame): Unit = {
    val raw = EdgeTableSource.read(spark, cfg.distances,
      opts.copy(filters = Nil, dropSelfLoops = false, distanceKind = EdgeOps.RawDistance))
    // one aggregate job per frame: stack both endpoint columns, then
    // count(*)/2 = edges and countDistinct = nodes in a single pass (the
    // reference counts during its single load pass, console.cpp:106-110);
    // `filtered` is the cached frame execute() reuses, so the filtered side
    // costs no extra input scan
    def stats(df: DataFrame): (Long, Long) = {
      val row = df.select(col("src").as("v")).unionAll(df.select(col("dst").as("v")))
        .agg(countDistinct(col("v")), count(lit(1))).head()
      (row.getLong(0), row.getLong(1) / 2)
    }
    val (n0, e0) = stats(raw)
    val (n1, e1) = stats(filtered)
    println(s"  input graph: $n0 nodes, $e0 edges")
    println(s"  filtered graph: $n1 nodes, $e1 edges")
    if (cfg.verbose) {
      println("\nDistance histogram")
      // A5 over the transformed distance; reference bounds 0, 0.001..0.05,
      // +inf, printed as first-match "d < bound: n" counts
      val hist = EdgeOps.weightHistogram(
          filtered.select(col("src"), col("dst"), col("weight").cast("double")),
          lo = 0.0, hi = 0.05, width = 0.001)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      println(s"  d < 0: 0")
      (0 until 50).foreach { i =>
        println(s"  d < ${(i + 1) * 0.001}: ${hist.getOrElse(i.toLong, 0L)}")
      }
      println(s"  d < inf: ${hist.getOrElse(50L, 0L)}")
      println()
    }
  }

  def main(args: Array[String]): Unit = {
    // `--version` prints and exits BEFORE positional validation, like the
    // reference's early ShowVersion return (src/params.cpp:30-34) — a
    // migrating script's bare `clusty --version` probe must not die on the
    // missing-positionals usage error
    if (args.contains("--version")) { println("graft (clusty-compatible CLI) 0.1.0"); return }
    val cfg = parse(args.toSeq)
    val builder = SparkSession.builder().appName("graft")
    if (!sys.props.contains("spark.master") && sys.env.get("MASTER").isEmpty)
      builder.master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
    val spark = builder
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val opts = readOptions(spark, cfg)
      // ONE filtered scan shared by the load report and the clustering run
      val filtered = EdgeTableSource.read(spark, cfg.distances, opts)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      printLoadReport(spark, cfg, opts, filtered)
      val out = execute(spark, cfg, filtered)
      val sep = if (cfg.outCsv) "," else "\t"
      if (cfg.outRepresentatives)
        AssignmentsSink.writeWithRepresentatives(out, cfg.output, sep, singleFile = true)
      else AssignmentsSink.write(out, cfg.output, sep, singleFile = true)
      println(s"[graft] wrote ${cfg.output} (${cfg.algo})")
    } finally spark.stop()
  }
}
