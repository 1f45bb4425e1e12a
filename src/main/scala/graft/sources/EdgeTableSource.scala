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

    val idType = if (opts.numericIds) "long" else "string"
    val projected = raw.select(
      (Seq(col(c1).cast(idType).as("src"), col(c2).cast(idType).as("dst"),
        col(dc).cast("double").as("weight")) ++
        opts.filters.map(f => col(resolve(f.column)).cast("double").as(f.column))): _*)

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
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapred.TextInputFormat
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val sc = spark.sparkContext
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(sc.hadoopConfiguration)
    // globStatus handles literal paths AND patterns (matching textFile's
    // old glob support); hidden-file filter mirrors FileInputFormat's
    // ('.'-prefixed sidecars like .crc, and '_'-prefixed markers)
    def visible(n: String) = !n.startsWith("_") && !n.startsWith(".")
    val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
    require(matched.nonEmpty, s"objects path matches nothing: $path")
    val files: Seq[String] = matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile) else Array(st)
    }.map(_.getPath).filter(pp => visible(pp.getName)).map(_.toString).sorted.toSeq
    val tagged = files.zipWithIndex.map { case (f, fi) =>
      sc.hadoopFile[LongWritable, Text, TextInputFormat](f)
        .flatMap { case (off, t) =>
          if (off.get == 0L) None // this file's header line
          else {
            val line = t.toString.stripSuffix("\r")
            if (line.isEmpty) None
            else {
              val cut = line.indexOf(sep)
              Some(((fi, off.get), if (cut >= 0) line.substring(0, cut) else line))
            }
          }
        }
    }
    val rows = sc.union(tagged)
      .sortBy(_._1) // range-partitioned sort on (fileIdx, byteOffset)
      .zipWithIndex()
      .map { case ((_, obj), i) => Row(obj, i) }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("object", StringType, nullable = false),
      StructField("rank", LongType, nullable = false))))
  }
}
