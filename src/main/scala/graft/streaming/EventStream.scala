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

  /** Tumbling event-time windows per event_type behind a watermark.
    * Works unchanged on a BATCH events DataFrame (withWatermark is a
    * no-op there) — the driver's q_windowed oracle row runs exactly this
    * code over the events table. */
  def windowedCounts(events: DataFrame, watermark: String = "30 minutes",
                     windowDur: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total"))

  /** Batch replay of `sessionize`: identical gap semantics computed
    * relationally (gaps-and-islands over event-time order) — the form a
    * DuckDB oracle can recompute, and the equality target EventStreamSpec
    * holds the streaming operator to. Time in MICROseconds (exact for
    * the parquet µs timestamps). One window + one grouped agg, both
    * partitioned by user — scales like any keyed aggregation. */
  def sessionizeBatch(events: DataFrame, gapMs: Long = 60 * 60 * 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("t")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // parquet event-time lands as TIMESTAMP_NTZ: its naive datetime is
    // epoch-diffed directly (pure field arithmetic, no timezone in play).
    // A cast("timestamp") here would interpret the naive value in
    // spark.sql.session.timeZone and shift start_us/end_us under any
    // non-UTC session. TIMESTAMP input is already an instant: unix_micros.
    val tExpr = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
      case org.apache.spark.sql.types.TimestampType => unix_micros(col("ts"))
      // string/date inputs keep the pre-NTZ-fix surface: parse in the
      // session zone first (unix_micros itself only accepts TIMESTAMP)
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    events.select(col("user_id"), tExpr.as("t"))
      .withColumn("__brk",
        when(col("t") - lag("t", 1).over(byUser) > gapMs * 1000L, 1).otherwise(0))
      .withColumn("__sid", sum("__brk").over(cum))
      .groupBy("user_id", "__sid")
      .agg(min("t").as("start_us"), max("t").as("end_us"),
        count(lit(1)).as("n_events"))
      .select("user_id", "start_us", "end_us", "n_events")
  }

  /**
   * Event-time sessionization: gap-separated sessions per user. State
   * holds ALL open sessions and a session is emitted ONLY once the
   * watermark passes its end + gap — never eagerly on a within-batch
   * gap split — so a late event inside the watermark horizon that
   * BRIDGES two provisional sessions merges them (and one arriving
   * before a session's recorded start extends it backwards) instead of
   * producing wrong splits. Append-mode results are therefore final.
   */
  def sessionize(events: DataFrame, watermark: String = "30 minutes",
                 gapMs: Long = 60 * 60 * 1000L)
                (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    // Session state times are MICROseconds: the batch replay
    // (sessionizeBatch) splits on exact µs gaps over the parquet µs
    // timestamps, and Timestamp.getTime would truncate to ms — two
    // events 1 gap + 1 µs apart would merge here but split there.
    // (The watermark itself is ms-granular — Spark's contract — so only
    // the CLOSING decision rounds, conservatively, never the split.)
    val gapUs = gapMs * 1000L
    def mergeAll(sessions: Seq[Session]): List[Session] =
      sessions.sortBy(_.start).foldLeft(List.empty[Session]) { (acc, s) =>
        acc match {
          case head :: rest if s.start - head.end <= gapUs =>
            Session(head.start, math.max(head.end, s.end), head.n + s.n) :: rest
          case _ => s :: acc
        }
      }.reverse
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

    def update(userId: Long, evs: Iterator[Ev],
               state: GroupState[List[Session]]): Iterator[SessionOut] = {
      val wm = state.getCurrentWatermarkMs()
      val merged =
        if (state.hasTimedOut) state.get
        else mergeAll(state.getOption.getOrElse(Nil) ++
          evs.map(e => Session(micros(e.ts), micros(e.ts), 1)))
      // a session is FINAL once nothing inside the watermark horizon can
      // still extend it: end + gap <= watermark
      val (closed, open) = merged.partition(_.end + gapUs <= wm * 1000L)
      if (open.isEmpty) state.remove()
      else {
        state.update(open)
        // fire again when the earliest open session can close; event-time
        // timeouts are ms-granular and must be strictly beyond the
        // current watermark
        state.setTimeoutTimestamp(
          math.max(open.map(_.end).min / 1000L + gapMs, wm + 1))
      }
      closed.iterator.map(s =>
        SessionOut(userId, s.start / 1000L, s.end / 1000L, s.n))
    }
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
