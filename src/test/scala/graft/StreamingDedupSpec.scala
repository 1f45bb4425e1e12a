package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup

/** dropDuplicatesWithinWatermark dedup-on-ingest, driven through the public
  * file-source API (each parquet append = one micro-batch). */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = 1704067200000L // 2024-01-01T00:00:00Z
  private val MIN = 60000L
  private def ts(ms: Long) = new Timestamp(ms)

  test("streaming dedup: first arrival wins, in-batch and across batches") {
    val dir = Files.createTempDirectory("graft-stream-dedup").toString
    // batch 1: a, b, and an exact re-send of a (different id, later ts)
    Seq((1L, ts(t0), "alpha beta gamma"),
        (2L, ts(t0 + 1 * MIN), "delta epsilon"),
        (3L, ts(t0 + 2 * MIN), "alpha beta gamma"))
      .toDF("doc_id", "ts", "text").repartition(1).write.mode("append").parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamingDedup.dedup(stream, watermark = "30 minutes").writeStream
      .outputMode("append").format("memory").queryName("dedup_test").start()
    try {
      q.processAllAvailable()
      val batch1 = spark.table("dedup_test").select("doc_id").as[Long].collect().toSet
      assert(batch1 == Set(1L, 2L), s"in-batch dedup failed: $batch1")

      // batch 2: another re-send of a (still inside the horizon — dropped),
      // plus a genuinely new doc (kept)
      Seq((4L, ts(t0 + 5 * MIN), "alpha beta gamma"),
          (5L, ts(t0 + 6 * MIN), "zeta eta"))
        .toDF("doc_id", "ts", "text").repartition(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val batch2 = spark.table("dedup_test").select("doc_id").as[Long].collect().toSet
      assert(batch2 == Set(1L, 2L, 5L), s"cross-batch dedup failed: $batch2")

      // survivors carry the 8-byte fingerprint column (the state key)
      val fps = spark.table("dedup_test").select("fingerprint").as[Long].collect()
      assert(fps.distinct.length == fps.length)
    } finally q.stop()
  }
}
