package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming link-graph ingest: a Common-Crawl-style pages STREAM
  * (url, warc_ts, html, text, lang) flows through the same codegen
  * extract/resolve kernels as the batch path ([[graft.ingest.LinkExtract]])
  * and lands as per-micro-batch EDGE DELTAS; the live edge table is the
  * compaction view over the deltas.
  *
  * Why deltas instead of a streaming aggregation: the (src, dst) key space
  * is corpus-sized — unbounded state no store should hold. Each micro-batch
  * is aggregated batch-locally (map-side combined) and written with
  * overwrite-by-batch-partition, so a replayed epoch after a crash
  * OVERWRITES its own delta instead of double-counting — the same
  * committed-partition idempotency contract as [[graft.graph.RankCheckpointer]]
  * (Iceberg semantics on the parquet stand-in). Compaction is one
  * partial-aggregated groupBy-sum, run on read or scheduled.
  *
  * ADR (BASELINE.md, round 5): parquet+marker is FINAL here (no table-format
  * jar in the sandbox); [[edgeTable]] is the swap point where a production
  * deployment would read a catalog table's committed snapshots instead.
  */
object StreamingIngest {

  /** Commit marker placed in a delta dir AFTER its parquet write completes —
    * same visibility rule as [[graft.graph.RankCheckpointer]]'s `_GRAFT_OK`:
    * a torn dir from a crashed epoch has no marker and is INVISIBLE to
    * [[edgeTable]] until the replayed epoch overwrites it and re-commits. */
  private[streaming] val CommitMarker = "_GRAFT_OK"

  /** Start the ingest query over a streaming pages DataFrame.
    * @param edgeDir delta root; each epoch writes `batch=<id>/` then commits
    *                it with a [[CommitMarker]].
    * @param checkpointDir Structured Streaming checkpoint (source offsets). */
  def start(pages: DataFrame, edgeDir: String, checkpointDir: String): StreamingQuery =
    pages
      .select(col("url").as("src"),
        explode(graft.functions.extract_hrefs(col("html"))).as("raw"))
      .select(col("src"), graft.functions.resolve_url(col("src"), col("raw")).as("dst"))
      .where(col("dst").isNotNull && col("src") =!= col("dst"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val dir = s"$edgeDir/batch=$id"
        batch.groupBy("src", "dst").agg(count(lit(1)).cast("double").as("weight"))
          .write.mode("overwrite").parquet(dir)
        // overwrite removed any stale marker from a previous torn attempt;
        // re-create it only once the full delta is durable
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
        fs.create(new org.apache.hadoop.fs.Path(dir, CommitMarker), true).close()
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** The live edge table: compaction view over the COMMITTED deltas only —
    * identical rows to the batch extractor run over the same pages. Delta
    * dirs without a [[CommitMarker]] (torn writes from a crashed epoch) are
    * skipped; the streaming checkpoint replays that epoch, overwrites the
    * torn dir and re-commits, so readers never see partial state. */
  def edgeTable(spark: SparkSession, edgeDir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(edgeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchDirs = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
    val committed = batchDirs
      .filter(st => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, CommitMarker)))
      .map(_.getPath.toString)
    // Pre-marker-era migration: delta roots written before the CommitMarker
    // protocol carry ZERO markers. Refusing to read fully-intact data would
    // make an upgrade destroy visibility, so when markers are entirely
    // absent under a non-empty root, fall back to reading every batch dir
    // with a loud warning (one-time fix: touch _GRAFT_OK in each). A MIXED
    // root (some markers present) keeps strict marker semantics — there the
    // unmarked dirs really are torn epochs.
    val visible =
      if (committed.nonEmpty) committed
      else {
        val all = batchDirs.map(_.getPath.toString)
        if (all.nonEmpty) {
          System.err.println(
            s"[graft] WARN: no $CommitMarker markers under $edgeDir — " +
              s"assuming pre-marker deltas and reading all ${all.size} batch dirs; " +
              s"touch $CommitMarker in each to migrate")
        }
        all
      }
    require(visible.nonEmpty, s"no committed batch=* deltas under $edgeDir")
    spark.read.option("basePath", edgeDir).parquet(visible: _*)
      .groupBy("src", "dst").agg(sum(col("weight")).as("weight"))
  }
}
