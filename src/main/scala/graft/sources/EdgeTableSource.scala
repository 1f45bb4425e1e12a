package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.EdgeOps

/** clusty-compatible edge-table source: header'd TSV/CSV with column roles
  * resolved by NAME with positional defaults, reproducing the reference's
  * loader semantics (SURVEY.md §2.1-2.2):
  *
  *  - S1/S3/S4: block reads, tokenizing, number parsing — Spark's CSV
  *    datasource (splitting, schema cast); unparsed extra columns are
  *    pruned by Catalyst, like the reference's byte-wise column skipping.
  *  - S2: ids default to the first two columns, distance to the third
  *    (reference: src/graph.cpp:69-108); named columns override; the id
  *    pair is order-normalized to header order, so (id2, id1) ≡ (id1, id2)
  *    (reference swap at src/graph.cpp:83-85); missing column -> error.
  *  - P1: similarity→distance transform applied at plan build.
  *  - P2: per-column [min,max] range filters, AND-ed, evaluated BEFORE
  *    anything downstream (Catalyst pushes them into the scan — the
  *    reference's in-parser filtering, src/graph_named.h:168-181).
  *  - P3: self-loop elimination.
  *
  * Returns (src, dst, weight:double) — string ids in named mode, long in
  * numeric mode (reference's ordinal ids, README.md:217).
  */
object EdgeTableSource {

  final case class Options(
      sep: String = "\t",
      idCols: Option[(String, String)] = None,
      distanceCol: Option[String] = None,
      numericIds: Boolean = false,
      distanceKind: EdgeOps.DistanceKind = EdgeOps.RawDistance,
      filters: Seq[EdgeOps.RangeFilter] = Nil,
      dropSelfLoops: Boolean = true)

  def read(spark: SparkSession, path: String, opts: Options = Options()): DataFrame = {
    val raw = spark.read
      .option("header", true)
      .option("sep", opts.sep)
      .csv(path)
    val header = raw.columns
    require(header.length >= 3,
      s"edge table needs >= 3 columns (two ids + distance), got ${header.length}") // graph.cpp:65-66

    def resolve(name: String): String = {
      require(header.contains(name), s"column '$name' not in header ${header.mkString(",")}")
      name
    }
    // positional defaults + order normalization to header position
    val (c1, c2) = opts.idCols match {
      case None => (header(0), header(1))
      case Some((a, b)) =>
        val (ra, rb) = (resolve(a), resolve(b))
        if (header.indexOf(ra) <= header.indexOf(rb)) (ra, rb) else (rb, ra)
    }
    val dc = opts.distanceCol.map(resolve).getOrElse(header(2))

    // try_cast, not cast: this build runs Spark 4 with ANSI mode on, where a
    // plain cast of a malformed numeric string THROWS. The contract (mirrored
    // by the RDD dictionary pass in firstAppearanceRanks) is that malformed
    // numerics become null and the row is dropped by the range/self-loop
    // predicates — try_cast restores exactly those null-on-error semantics.
    val idType = if (opts.numericIds) "long" else "string"
    val projected = raw.select(
      (Seq(col(c1).try_cast(idType).as("src"), col(c2).try_cast(idType).as("dst"),
        col(dc).try_cast("double").as("weight")) ++
        opts.filters.map(f => col(resolve(f.column)).try_cast("double").as(f.column))): _*)

    // P2 before anything downstream (ids of dropped rows never materialize)
    val filtered = EdgeOps.rangeFilters(projected, opts.filters)
      .select(col("src"), col("dst"), col("weight"))
    val transformed = EdgeOps.distanceTransform(filtered, opts.distanceKind)
    if (opts.dropSelfLoops) EdgeOps.dropSelfLoops(transformed) else transformed
  }

  /** S5 — objects-file scan: one-column header'd table; rank = line order
    * (decreasing representativeness; reference src/console.cpp:126-227).
    *
    * Line order must be exact, so this is one of the few genuinely forced
    * RDD hops: `textFile` (TextInputFormat) generates splits per file in
    * offset order with files in listing order, so `zipWithIndex` recovers
    * the physical line number with full parallelism. A DataFrame file scan
    * cannot — `FilePartition` packs splits by SIZE, so both a global
    * `row_number` window (single-partition funnel) and
    * `monotonically_increasing_id` (partition order ≠ file order) are wrong
    * at scale. Multi-file directories are ordered by (path asc, byte
    * offset) EXPLICITLY — Hadoop's split enumeration does not promise
    * listing order, so the files are listed and sorted here and every
    * record carries its (fileIdx, offset) sort key through one
    * range-partitioned sort. The header line of EVERY file is skipped
    * (byte offset 0 ⇔ first line of its file), so a directory of headered
    * part files does not ingest phantom header objects; blank lines are
    * dropped. */
  def readObjects(spark: SparkSession, path: String, sep: String = "\t"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val rows = orderedLines(spark, path)
      .map { case (key, line) =>
        val cut = line.indexOf(sep)
        (key, if (cut >= 0) line.substring(0, cut) else line)
      }
      .sortBy(_._1) // range-partitioned sort on (fileIdx, byteOffset)
      .zipWithIndex()
      .map { case ((_, obj), i) => Row(obj, i) }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("object", StringType, nullable = false),
      StructField("rank", LongType, nullable = false))))
  }

  /** Non-header, non-empty lines of a file/directory/glob, each keyed by its
    * deterministic physical position `(fileIdx, byteOffset)` — the shared
    * scanner behind [[readObjects]] and [[firstAppearanceRanks]] (see the S5
    * scaladoc above for why a DataFrame scan cannot recover line order). */
  private def orderedLines(spark: SparkSession, path: String)
      : org.apache.spark.rdd.RDD[((Int, Long), String)] = {
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapred.TextInputFormat
    val sc = spark.sparkContext
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(sc.hadoopConfiguration)
    // globStatus handles literal paths AND patterns (matching textFile's
    // old glob support); hidden-file filter mirrors FileInputFormat's
    // ('.'-prefixed sidecars like .crc, and '_'-prefixed markers)
    def visible(n: String) = !n.startsWith("_") && !n.startsWith(".")
    val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
    require(matched.nonEmpty, s"input path matches nothing: $path")
    val files: Seq[String] = matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile) else Array(st)
    }.map(_.getPath).filter(pp => visible(pp.getName)).map(_.toString).sorted.toSeq
    val tagged = files.zipWithIndex.map { case (f, fi) =>
      sc.hadoopFile[LongWritable, Text, TextInputFormat](f)
        .flatMap { case (off, t) =>
          if (off.get == 0L) None // this file's header line
          else {
            val line = t.toString.stripSuffix("\r")
            if (line.isEmpty) None else Some(((fi, off.get), line))
          }
        }
    }
    sc.union(tagged)
  }

  /** J1 first-appearance ranks: `(object, rank)` where rank is the dense
    * 0-based order in which each id is FIRST seen scanning the edge table
    * row by row, first id column before second (header order, the S2
    * normalization), counting only rows that survive the P2 range filters
    * and P3 self-loop drop — exactly the reference's sequential local-id
    * assignment (src/graph_named.h:215-247 registers names per surviving
    * edge; filtered rows never reach updateMappings). This is what makes a
    * no-`--objects-file` CLI run bit-compatible with the reference: cluster
    * ids there are seeded in local-id order (src/single_bfs.h), and the
    * size-renumber breaks ties by that order (stable_sort,
    * src/graph.cpp:42).
    *
    * Distributed shape: the line scan is embarrassingly parallel; order is
    * recovered from the (fileIdx, byteOffset) key by one range-partitioned
    * sort + zipWithIndex (same justified RDD hop as [[readObjects]]), then
    * a min-aggregate per name and one more dense ranking. */
  def firstAppearanceRanks(spark: SparkSession, path: String,
                           opts: Options = Options()): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val sepRegex = java.util.regex.Pattern.quote(opts.sep)
    val header0 = spark.sparkContext.textFile(path).first().stripSuffix("\r")
    val header = header0.split(sepRegex, -1).map(_.trim)
    require(header.length >= 3,
      s"edge table needs >= 3 columns (two ids + distance), got ${header.length}")
    def idx(name: String): Int = {
      val i = header.indexOf(name)
      require(i >= 0, s"column '$name' not in header ${header.mkString(",")}")
      i
    }
    val (a, b) = opts.idCols match {
      case None => (0, 1)
      case Some((x, y)) => (idx(x), idx(y))
    }
    val (i1, i2) = if (a <= b) (a, b) else (b, a) // S2 order normalization
    val filt: Array[(Int, Double, Double)] = opts.filters.map(f =>
      (idx(f.column), f.min.getOrElse(Double.NegativeInfinity),
        f.max.getOrElse(Double.PositiveInfinity))).toArray
    val dropSelf = opts.dropSelfLoops
    val numeric = opts.numericIds
    val needed = (Seq(i1, i2) ++ filt.map(_._1)).max + 1

    // Survival rules must mirror the DataFrame read path EXACTLY, or the two
    // scans can disagree on which rows register names (or this one can crash
    // on input the edge reader accepts): a malformed numeric field there is
    // try_cast("double") -> null -> dropped by the range predicate (ANSI mode
    // is on in Spark 4, so a plain cast would THROW — [[read]] uses try_cast
    // for precisely this parity), so here it parses to None -> row dropped,
    // never a NumberFormatException. Same for the self-loop drop in numeric
    // mode: `TRY_CAST(id) IS NULL` makes the src<>dst predicate null -> row
    // dropped, and the comparison is on the cast values ("01" == "1"), not
    // the raw tokens.
    def parseD(s: String): Option[Double] = {
      val t = s.trim
      if (t.isEmpty) None else try Some(t.toDouble) catch { case _: NumberFormatException => None }
    }
    def parseL(s: String): Option[Long] = {
      val t = s.trim
      if (t.isEmpty) None else try Some(t.toLong) catch { case _: NumberFormatException => None }
    }
    val pairs = orderedLines(spark, path).flatMap { case ((fi, off), line) =>
      val toks = line.split(sepRegex, -1)
      val ok = toks.length >= needed &&
        filt.forall { case (c, mn, mx) =>
          parseD(toks(c)).exists(v => v >= mn && v <= mx) } &&
        (!dropSelf || {
          if (numeric) (parseL(toks(i1)), parseL(toks(i2))) match {
            case (Some(a), Some(b)) => a != b
            case _ => false // null id -> null predicate -> row dropped
          }
          else toks(i1) != toks(i2)
        })
      if (ok) Seq(((fi, off, 0), toks(i1)), ((fi, off, 1), toks(i2))) else Nil
    }
    val firstSeen = pairs
      .sortBy(_._1)
      .zipWithIndex()
      .map { case ((_, name), ord) => (name, ord) }
      .reduceByKey(math.min(_, _))
      .map { case (name, ord) => Row(name, ord) }
    val df = spark.createDataFrame(firstSeen, StructType(Seq(
      StructField("object", StringType, nullable = false),
      StructField("ord", LongType, nullable = false))))
    graft.core.Ranking.withGlobalRank(df, "rank", org.apache.spark.sql.functions.col("ord").asc)
      .select(org.apache.spark.sql.functions.col("object"),
        org.apache.spark.sql.functions.col("rank"))
  }
}
