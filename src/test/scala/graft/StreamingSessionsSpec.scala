package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.streaming.{EventOps, StreamingSessions}

/** flatMapGroupsWithState sessionization vs the batch window form: same
  * sessions, and event-time timeout flushes open sessions once the
  * watermark passes. Driven through the public file-source API (two parquet
  * appends = two micro-batches). */
class StreamingSessionsSpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = 1704067200000L // 2024-01-01T00:00:00Z
  private val MIN = 60000L
  private def ts(ms: Long) = new Timestamp(ms)

  test("streaming sessions: in-batch close + watermark timeout flush") {
    val dir = Files.createTempDirectory("graft-stream-sess").toString
    val data1 = Seq(
      (1L, ts(t0), 1.0), (1L, ts(t0 + 10 * MIN), 2.0), (1L, ts(t0 + 50 * MIN), 4.0),
      (2L, ts(t0 + 5 * MIN), 8.0))
    data1.toDF("user_id", "ts", "value").repartition(1)
      .write.mode("append").parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
      .withWatermark("ts", "30 minutes")
      .as[StreamingSessions.SessionEvent]
    val q = StreamingSessions.sessions(stream, gapMinutes = 30).writeStream
      .outputMode("append").format("memory").queryName("sess_test").start()
    try {
      q.processAllAvailable()
      val closedInBatch = spark.table("sess_test").as[StreamingSessions.SessionRow]
        .collect().map(r => (r.user_id, r.session_seq, r.session_start.getTime,
          r.session_end.getTime, r.n_events, r.value_sum)).toSet
      // u1's first session closes inside batch 1 (gap 40 min > 30);
      // u1's second and u2's only session are still open.
      assert(closedInBatch == Set((1L, 1L, t0, t0 + 10 * MIN, 2L, 3.0)))

      // batch 2: far-future row advances the watermark -> timeouts fire
      Seq((99L, ts(t0 + 86400000L), 0.0)).toDF("user_id", "ts", "value")
        .repartition(1).write.mode("append").parquet(dir)
      q.processAllAvailable()

      val afterFlush = spark.table("sess_test").as[StreamingSessions.SessionRow]
        .collect().map(r => (r.user_id, r.session_seq, r.session_start.getTime,
          r.session_end.getTime, r.n_events, r.value_sum)).toSet
      assert(afterFlush == Set(
        (1L, 1L, t0, t0 + 10 * MIN, 2L, 3.0),
        (1L, 2L, t0 + 50 * MIN, t0 + 50 * MIN, 1L, 4.0),
        (2L, 1L, t0 + 5 * MIN, t0 + 5 * MIN, 1L, 8.0)))
      // u99's session is still open: not emitted

      // cross-check against the batch sessionizer (same 1-based seq)
      val batch = EventOps.sessions(
          data1.toDF("user_id", "ts", "value").withColumn("event_id", lit(0L)))
        .collect().map(r => (r.getLong(r.fieldIndex("user_id")),
          r.getLong(r.fieldIndex("session_seq")),
          r.getTimestamp(r.fieldIndex("session_start")).getTime,
          r.getTimestamp(r.fieldIndex("session_end")).getTime,
          r.getLong(r.fieldIndex("n_events")),
          r.getDouble(r.fieldIndex("value_sum")))).toSet
      assert(batch == afterFlush)

      // batch 3: u1 RETURNS after its timeout flush — the tombstone must
      // carry the sequence forward (seq 3), not restart at 1
      val t1 = t0 + 86400000L + 10 * MIN
      Seq((1L, ts(t1), 5.0)).toDF("user_id", "ts", "value")
        .repartition(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      // batch 4: flush everything still open
      Seq((98L, ts(t0 + 2 * 86400000L), 0.0)).toDF("user_id", "ts", "value")
        .repartition(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sess_test").as[StreamingSessions.SessionRow]
      .collect().map(r => (r.user_id, r.session_seq, r.session_start.getTime,
        r.session_end.getTime, r.n_events, r.value_sum)).toSet
    assert(got == Set(
      (1L, 1L, t0, t0 + 10 * MIN, 2L, 3.0),
      (1L, 2L, t0 + 50 * MIN, t0 + 50 * MIN, 1L, 4.0),
      (2L, 1L, t0 + 5 * MIN, t0 + 5 * MIN, 1L, 8.0),
      (1L, 3L, t0 + 86400000L + 10 * MIN, t0 + 86400000L + 10 * MIN, 1L, 5.0),
      (99L, 1L, t0 + 86400000L, t0 + 86400000L, 1L, 0.0)))
    // u98's session is still open: not emitted
  }

  test("tombstone TTL: seq survives within the horizon, state drops beyond it") {
    val dir = Files.createTempDirectory("graft-sess-ttl").toString
    val HOUR = 3600000L
    Seq((1L, ts(t0), 1.0)).toDF("user_id", "ts", "value")
      .repartition(1).write.mode("append").parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
      .withWatermark("ts", "30 minutes")
      .as[StreamingSessions.SessionEvent]
    val q = StreamingSessions.sessions(stream, gapMinutes = 30,
        tombstoneTtlHours = Some(2)).writeStream
      .outputMode("append").format("memory").queryName("sess_ttl").start()
    try {
      q.processAllAvailable()
      // advance watermark 1h: session 1 flushes, tombstone armed (TTL 2h)
      Seq((99L, ts(t0 + HOUR), 0.0)).toDF("user_id", "ts", "value")
        .repartition(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      // u1 returns INSIDE the ttl horizon: seq must continue at 2
      Seq((1L, ts(t0 + HOUR + 10 * MIN), 2.0)).toDF("user_id", "ts", "value")
        .repartition(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      // advance far past gap+TTL: session 2 flushes, then its tombstone expires
      Seq((98L, ts(t0 + 12 * HOUR), 0.0)).toDF("user_id", "ts", "value")
        .repartition(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      Seq((97L, ts(t0 + 24 * HOUR), 0.0)).toDF("user_id", "ts", "value")
        .repartition(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      // u1 returns BEYOND the horizon: forgotten, seq restarts at 1
      Seq((1L, ts(t0 + 24 * HOUR + 10 * MIN), 4.0)).toDF("user_id", "ts", "value")
        .repartition(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      Seq((96L, ts(t0 + 48 * HOUR), 0.0)).toDF("user_id", "ts", "value")
        .repartition(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sess_ttl").as[StreamingSessions.SessionRow]
      .collect().filter(_.user_id == 1L)
      .map(r => (r.session_seq, r.session_start.getTime, r.n_events)).toSet
    assert(got == Set(
      (1L, t0, 1L),                      // first session
      (2L, t0 + HOUR + 10 * MIN, 1L),    // within TTL: seq carried to 2
      (1L, t0 + 24 * HOUR + 10 * MIN, 1L)), // beyond TTL: forgotten, seq 1 again
      s"got $got")
  }

  test("checkpoint recovery: restart resumes per-user state, no loss or re-emit") {
    val dir = Files.createTempDirectory("graft-sess-recov-in").toString
    val ckpt = Files.createTempDirectory("graft-sess-recov-ck").toString
    val outDir = Files.createTempDirectory("graft-sess-recov-out").toString

    // durable file sink: the memory sink cannot recover from a checkpoint
    def startQuery() = {
      val schema = spark.read.parquet(dir).schema
      val stream = spark.readStream.schema(schema).parquet(dir)
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
        .withWatermark("ts", "30 minutes")
        .as[StreamingSessions.SessionEvent]
      StreamingSessions.sessions(stream, gapMinutes = 30).writeStream
        .outputMode("append").format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).start()
    }

    // batch 1: u7 opens a session (2 events), then the query is STOPPED
    Seq((7L, ts(t0), 1.0), (7L, ts(t0 + 5 * MIN), 2.0))
      .toDF("user_id", "ts", "value").repartition(1).write.mode("append").parquet(dir)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // while down: a third event lands inside the same session window
    Seq((7L, ts(t0 + 10 * MIN), 4.0))
      .toDF("user_id", "ts", "value").repartition(1).write.mode("append").parquet(dir)

    // restart from the checkpoint: the open-session state must survive,
    // so the in-gap event EXTENDS the session instead of starting seq 1
    // again; a far-future row then flushes it
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      Seq((99L, ts(t0 + 86400000L), 0.0))
        .toDF("user_id", "ts", "value").repartition(1).write.mode("append").parquet(dir)
      q2.processAllAvailable()
      val got = spark.read.parquet(outDir).as[StreamingSessions.SessionRow]
        .collect().map(r => (r.user_id, r.session_seq, r.session_start.getTime,
          r.session_end.getTime, r.n_events, r.value_sum)).toSet
      assert(got == Set((7L, 1L, t0, t0 + 10 * MIN, 3L, 7.0)),
        s"state did not survive the restart: $got")
    } finally q2.stop()
  }
}
