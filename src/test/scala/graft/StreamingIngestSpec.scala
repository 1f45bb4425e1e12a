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

    // TORN-WRITE visibility: a plain overwrite of a delta dir WITHOUT
    // re-committing is exactly what a crashed epoch leaves behind (data
    // present or partial, no _GRAFT_OK) — the compaction view must skip it
    val tmp = Files.createTempDirectory("graft-ingest-replay").toString
    spark.read.parquet(s"$edgeDir/batch=0").write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(s"$edgeDir/batch=0")
    val torn = StreamingIngest.edgeTable(spark, edgeDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val withoutB0 = LinkExtract.edges(
        all.where(abs(xxhash64(col("url"))) % 2 === 1))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(torn == withoutB0,
      "torn (uncommitted) delta dir leaked into the compaction view")

    // crash-replay idempotency: the replayed epoch overwrites its own delta
    // and re-commits — the compaction converges back to the batch table
    Files.createFile(java.nio.file.Paths.get(s"$edgeDir/batch=0/_GRAFT_OK"))
    val again = StreamingIngest.edgeTable(spark, edgeDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(again == batch)
  }

  test("a torn delta dir with a partial part-file stays invisible until recommitted") {
    val pagesDir = Files.createTempDirectory("graft-torn-pages").toString
    val edgeDir = Files.createTempDirectory("graft-torn-edges").toString
    val ckpt = Files.createTempDirectory("graft-torn-ckpt").toString

    val pages = PageSynth.pages(spark, 120L, seed = 11L, numPartitions = 2)
    pages.toDF().repartition(1).write.mode("append").parquet(pagesDir)
    val schema = spark.read.parquet(pagesDir).schema
    val q = StreamingIngest.start(
      spark.readStream.schema(schema).parquet(pagesDir), edgeDir, ckpt)
    try q.processAllAvailable() finally q.stop()

    val committed = StreamingIngest.edgeTable(spark, edgeDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(committed.nonEmpty)

    // plant a torn epoch: a batch dir holding a truncated (unreadable)
    // part-file and NO commit marker — the kill-mid-write shape
    val tornDir = java.nio.file.Paths.get(s"$edgeDir/batch=999")
    Files.createDirectories(tornDir)
    Files.write(tornDir.resolve("part-00000-dead.snappy.parquet"),
      Array[Byte]('P', 'A', 'R', '1', 0, 1, 2)) // valid magic, truncated body
    val seen = StreamingIngest.edgeTable(spark, edgeDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(seen == committed, "torn batch=999 was read by the compaction view")
  }

  test("pre-marker delta roots (zero markers anywhere) stay readable after upgrade") {
    val pagesDir = Files.createTempDirectory("graft-mig-pages").toString
    val edgeDir = Files.createTempDirectory("graft-mig-edges").toString
    val ckpt = Files.createTempDirectory("graft-mig-ckpt").toString

    val pages = PageSynth.pages(spark, 80L, seed = 3L, numPartitions = 2)
    pages.toDF().repartition(1).write.mode("append").parquet(pagesDir)
    val schema = spark.read.parquet(pagesDir).schema
    val q = StreamingIngest.start(
      spark.readStream.schema(schema).parquet(pagesDir), edgeDir, ckpt)
    try q.processAllAvailable() finally q.stop()
    val withMarkers = StreamingIngest.edgeTable(spark, edgeDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet

    // simulate a pre-upgrade root: intact data, no markers at all
    java.nio.file.Files.walk(java.nio.file.Paths.get(edgeDir)).iterator()
      .forEachRemaining { p =>
        if (p.getFileName.toString == "_GRAFT_OK") java.nio.file.Files.delete(p)
      }
    val migrated = StreamingIngest.edgeTable(spark, edgeDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(migrated == withMarkers,
      "marker-less (pre-upgrade) delta root became invisible")
  }
}
