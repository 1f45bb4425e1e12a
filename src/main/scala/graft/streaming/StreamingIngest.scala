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
  */
object StreamingIngest {

  /** Start the ingest query over a streaming pages DataFrame.
    * @param edgeDir delta root; each epoch writes `batch=<id>/` atomically.
    * @param checkpointDir Structured Streaming checkpoint (source offsets). */
  def start(pages: DataFrame, edgeDir: String, checkpointDir: String): StreamingQuery =
    pages
      .select(col("url").as("src"),
        explode(graft.functions.extract_hrefs(col("html"))).as("raw"))
      .select(col("src"), graft.functions.resolve_url(col("src"), col("raw")).as("dst"))
      .where(col("dst").isNotNull && col("src") =!= col("dst"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.groupBy("src", "dst").agg(count(lit(1)).cast("double").as("weight"))
          .write.mode("overwrite").parquet(s"$edgeDir/batch=$id")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** The live edge table: compaction view over all committed deltas —
    * identical rows to the batch extractor run over the same pages. */
  def edgeTable(spark: SparkSession, edgeDir: String): DataFrame =
    spark.read.option("basePath", edgeDir).parquet(s"$edgeDir/batch=*")
      .groupBy("src", "dst").agg(sum(col("weight")).as("weight"))
}
