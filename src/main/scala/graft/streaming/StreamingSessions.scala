package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: the unbounded counterpart of
  * [[EventOps.sessions]], built on `flatMapGroupsWithState` with event-time
  * timeout — the engine's custom-state streaming primitive.
  *
  * Semantics match the batch form exactly: a session closes when the gap to
  * the user's next event exceeds `gapMinutes`; a closed session emits
  * (user_id, session_seq, session_start, session_end, n_events, value_sum);
  * `session_seq` is 1-based and strictly monotone per user for the lifetime
  * of the query — a timeout flush leaves a zero-event tombstone carrying the
  * next sequence number, so a user returning after an idle gap can never
  * re-emit an already-used (user_id, session_seq) key.
  *
  * Scale shape: state is O(1) per ever-seen user (one open session or one
  * tombstone), partitioned by user_id; each micro-batch shuffles only its
  * own events once. At web scale O(ever-seen users) is itself a slow state
  * leak — opt into `tombstoneTtlHours` to bound it at O(recently-active
  * users), trading seq reuse beyond the horizon. Checkpoint the query for exactly-once resume — the
  * state store carries the open sessions across restarts.
  */
object StreamingSessions {

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(sessionSeq: Long, startMs: Long, endMs: Long,
                         nEvents: Long, valueSum: Double)
  case class SessionRow(user_id: Long, session_seq: Long,
                        session_start: Timestamp, session_end: Timestamp,
                        n_events: Long, value_sum: Double)

  /** Apply to a *streaming* Dataset (readStream source) with columns
    * (user_id: long, ts: timestamp, value: double); requires a watermark on
    * `ts` at least as large as the session gap.
    *
    * @param tombstoneTtlHours when set, a flushed user's zero-event
    *   tombstone (the seq-monotonicity carrier) is itself dropped once the
    *   user has been idle this long past the session gap — bounding state
    *   at O(users active within TTL) instead of O(ever-seen users), at the
    *   documented price that a user returning after the horizon restarts
    *   session_seq at 1. None (default) = strict monotonicity forever,
    *   state O(ever-seen users). */
  def sessions(events: Dataset[SessionEvent], gapMinutes: Int = 30,
               tombstoneTtlHours: Option[Int] = None): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    val ttlMs = tombstoneTtlHours.map(_ * 3600000L)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, it, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            if (s.nEvents == 0L) {
              // the tombstone's own TTL expired: forget the user entirely
              // (seq may be reused beyond this horizon — the documented trade)
              state.remove()
              Iterator.empty
            } else {
              // watermark passed (end + gap): flush the open session. Keep a
              // zero-event tombstone holding the NEXT sequence number
              // instead of state.remove(), which would restart seq at 1;
              // with a TTL the tombstone gets its own far-future timeout.
              val deadline = ttlMs.map(s.endMs + gapMs + _)
              if (deadline.exists(_ <= state.getCurrentWatermarkMs())) {
                // the flush itself arrived beyond the horizon (timeouts fire
                // when the watermark jumps): no tombstone, forget the user
                state.remove()
              } else {
                state.update(OpenSession(s.sessionSeq + 1, s.endMs, s.endMs, 0L, 0.0))
                deadline.foreach(state.setTimeoutTimestamp)
              }
              Iterator.single(SessionRow(userId, s.sessionSeq,
                new Timestamp(s.startMs), new Timestamp(s.endMs), s.nEvents, s.valueSum))
            }
          } else {
            // micro-batch iterators are unordered: sort by event time
            val evs = it.toVector.sortBy(_.ts.getTime)
            // a tombstone (nEvents == 0) is not an open session, only a
            // carried sequence counter
            var open = state.getOption.filter(_.nEvents > 0L)
            var seq = state.getOption.map(_.sessionSeq).getOrElse(1L)
            val out = Vector.newBuilder[SessionRow]
            evs.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.endMs <= gapMs =>
                  open = Some(s.copy(endMs = math.max(s.endMs, t),
                    nEvents = s.nEvents + 1, valueSum = s.valueSum + e.value))
                case Some(s) => // gap exceeded: close, start next
                  out += SessionRow(userId, s.sessionSeq,
                    new Timestamp(s.startMs), new Timestamp(s.endMs), s.nEvents, s.valueSum)
                  seq = s.sessionSeq + 1
                  open = Some(OpenSession(seq, t, t, 1L, e.value))
                case None =>
                  open = Some(OpenSession(seq, t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            out.result().iterator
          }
      }
  }

  /** Convenience: run the streaming sessionizer over a bounded parquet
    * directory with a memory sink and return the materialized sessions
    * (demonstrates the batch→stream migration path on the events table). */
  def sessionsFromParquet(spark: SparkSession, parquetPath: String, gapMinutes: Int = 30,
                          queryName: String = "graft_stream_sessions"): Dataset[SessionRow] = {
    import spark.implicits._
    val schema = spark.read.parquet(parquetPath).schema
    val stream = spark.readStream.schema(schema).parquet(parquetPath)
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", s"$gapMinutes minutes")
      .as[SessionEvent]
    val q = sessions(stream, gapMinutes).writeStream
      .outputMode("append").format("memory").queryName(queryName).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName).as[SessionRow]
  }
}
