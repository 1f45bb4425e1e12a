package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ingest.{LinkExtract, PageSynth}
import graft.streaming.StreamingIngest

/** Streaming pages → edge-delta ingest: micro-batched extraction through
  * the same codegen kernels as the batch path, per-epoch overwrite
  * idempotency, and the compaction view equal to the batch extractor. */
class StreamingIngestSpec extends SparkTestBase {

  test("streamed edge deltas compact to exactly the batch edge table") {
    val pagesDir = Files.createTempDirectory("graft-ingest-pages").toString
    val edgeDir = Files.createTempDirectory("graft-ingest-edges").toString
    val ckpt = Files.createTempDirectory("graft-ingest-ckpt").toString

    val all = PageSynth.pages(spark, 300L, seed = 7L, numPartitions = 4)
    // two appends = two micro-batches
    val dfAll = all.toDF()
    dfAll.where(abs(xxhash64(col("url"))) % 2 === 0)
      .repartition(1).write.mode("append").parquet(pagesDir)

    val schema = spark.read.parquet(pagesDir).schema
    val stream = spark.readStream.schema(schema).parquet(pagesDir)
    val q = StreamingIngest.start(stream, edgeDir, ckpt)
    try {
      q.processAllAvailable()
      dfAll.where(abs(xxhash64(col("url"))) % 2 === 1)
        .repartition(1).write.mode("append").parquet(pagesDir)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamingIngest.edgeTable(spark, edgeDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val batch = LinkExtract.edges(all)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(streamed == batch,
      s"delta compaction diverged: ${streamed.size} vs ${batch.size} edges")
    assert(streamed.nonEmpty)

    // per-epoch idempotency: re-writing a batch's delta dir (the crash-replay
    // path) leaves the compaction unchanged
    val tmp = Files.createTempDirectory("graft-ingest-replay").toString
    spark.read.parquet(s"$edgeDir/batch=0").write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(s"$edgeDir/batch=0")
    val again = StreamingIngest.edgeTable(spark, edgeDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(again == batch)
  }
}
