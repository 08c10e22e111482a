package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured-Streaming surface over the events table (ts TIMESTAMP) —
 * the watermark + windowed-agg + custom-state capabilities of the
 * training-data brief. (The reference is batch-only, SURVEY §2.9; this
 * is forward capability like ImageStream.)
 *
 *  - `windowedCounts`: event-time tumbling-window aggregation behind a
 *    watermark — append mode emits a window only once the watermark
 *    passes it, so results are final and late data beyond the watermark
 *    drops. State is bounded by (open windows x event types).
 *  - `sessionize`: per-user sessions via flatMapGroupsWithState with an
 *    EVENT-TIME timeout — a session closes (and emits exactly once)
 *    when the watermark passes its last event + gap. The canonical
 *    KeyValueGroupedDataset custom-state shape.
 *
 * Scale: both are keyed streaming aggregations — state is per (window,
 * type) / per open session, partitioned by the grouping key across
 * executors; nothing driver-side.
 */
object EventStream {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp)
  final case class Session(start: Long, end: Long, n: Long)
  final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** Streaming exact dedup: drop re-delivered events by id within the
    * watermark horizon — state is bounded by ids seen inside the
    * watermark window (the streaming face of the batch dedup family). */
  def dedupStream(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Tumbling event-time windows per event_type behind a watermark. */
  def windowedCounts(events: DataFrame, watermark: String = "30 minutes",
                     windowDur: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total"))

  /** Event-time sessionization: gap-separated sessions per user, closed
    * and emitted when the watermark passes last-event + gap. */
  def sessionize(events: DataFrame, watermark: String = "30 minutes",
                 gapMs: Long = 60 * 60 * 1000L)
                (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    def update(userId: Long, evs: Iterator[Ev],
               state: GroupState[Session]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(SessionOut(userId, s.start, s.end, s.n))
      } else {
        val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
        var cur = state.getOption
        evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.end <= gapMs =>
              cur = Some(Session(s.start, math.max(s.end, t), s.n + 1))
            case Some(s) =>
              out += SessionOut(userId, s.start, s.end, s.n)
              cur = Some(Session(t, t, 1))
            case None =>
              cur = Some(Session(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        out.iterator
      }
    }
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
