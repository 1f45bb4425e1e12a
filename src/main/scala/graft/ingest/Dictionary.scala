package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** String→dense-id dictionary encoding (clusty J1/J2: sequential
  * first-appearance local ids, reference src/graph_named.h:212-247 /
  * src/graph_numbered.h:215-244).
  *
  * The reference forces ids through a single ordered mapper thread to make
  * them deterministic; we instead derive ids from content (total sort +
  * zipWithIndex) or from an explicit rank column, both order-independent
  * under any parallelism. Three strategies, by scale:
  *
  *  - [[buildSorted]]  — ids = rank in lexicographic order. One total sort
  *    (range exchange) + the one contained RDD hop SURVEY.md §7.2 allows
  *    (`zipWithIndex`, two passes, no collect). Dense and deterministic.
  *  - [[buildFromRank]] — ids = caller-provided priority rank (clusty's
  *    objects-file order). No extra shuffle if ranks are precomputed.
  *  - [[buildHashed]] — ids = xxhash64(name): shuffle-free, not dense; only
  *    for joins/bucketing where density is not needed (collision odds at
  *    10^12 keys are non-negligible, so never for final outputs).
  */
object Dictionary {

  /** @return (object: String, vid: Long) with vid dense 0..n-1 by sorted order. */
  def buildSorted(df: DataFrame, column: String): DataFrame = {
    val spark = df.sparkSession
    val distinct = df.select(col(column).as("object")).where(col("object").isNotNull).distinct()
    val indexed = distinct.orderBy(col("object")).rdd
      .zipWithIndex()
      .map { case (r: Row, i: Long) => Row(r.get(0), i) }
    val schema = StructType(Seq(
      StructField("object", distinct.schema.head.dataType, nullable = false),
      StructField("vid", LongType, nullable = false)))
    spark.createDataFrame(indexed, schema)
  }

  /** Dictionary from an explicit priority table (object, rank) — vid = rank. */
  def buildFromRank(universe: DataFrame): DataFrame =
    universe.select(col("object"), col("rank").cast("long").as("vid"))

  /** Shuffle-free hashed ids (non-dense). */
  def buildHashed(df: DataFrame, column: String): DataFrame =
    df.select(col(column).as("object")).distinct()
      .select(col("object"), xxhash64(col("object")).as("vid"))

  /** Encode a string edge table to long vertex ids via two dictionary joins.
    * Dictionary side is broadcast when small, else sort-merge — Catalyst/AQE
    * picks; at web scale this is the canonical big-join-small pattern. */
  def encodeEdges(edges: DataFrame, dict: DataFrame,
                  src: String = "src", dst: String = "dst"): DataFrame = {
    val d1 = dict.select(col("object").as("__s"), col("vid").as("src_id"))
    val d2 = dict.select(col("object").as("__d"), col("vid").as("dst_id"))
    val rest = edges.columns.filterNot(c => c == src || c == dst).map(col)
    edges.join(d1, edges(src) === col("__s"))
      .join(d2, edges(dst) === col("__d"))
      .select((Seq(col("src_id").as("src"), col("dst_id").as("dst")) ++ rest): _*)
  }

  /** Decode an assignment table (vid-keyed) back to object names. */
  def decode(assign: DataFrame, dict: DataFrame, vidCol: String = "vertex"): DataFrame = {
    val rest = assign.columns.filterNot(_ == vidCol).map(col)
    assign.join(dict, assign(vidCol) === dict("vid"))
      .select((Seq(col("object")) ++ rest): _*)
  }
}
