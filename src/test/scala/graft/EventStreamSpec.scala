package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream
import java.nio.file.Files
import java.sql.Timestamp

/** Watermark semantics need the watermark to ADVANCE between
  * micro-batches: early events land in batch 1, a far-future event in
  * batch 2 pushes the watermark past batch 1's windows/sessions so
  * append mode emits them as FINAL results. */
class EventStreamSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // hour-aligned base: tumbling windows snap to epoch-hour boundaries
  private val Base = 1700000000000L - (1700000000000L % 3600000L)
  private def ts(minute: Long) = new Timestamp(Base + minute * 60000L)

  private def writeBatches(dir: String): Unit = {
    val early = Seq(
      // window [t0, t0+1h): 3 clicks, 1 view; user 1 session of 3, user 2 of 1
      (1L, ts(0), 1L, "click", 10.0, "{}"),
      (2L, ts(5), 1L, "click", 2.5, "{}"),
      (3L, ts(20), 1L, "click", 1.0, "{}"),
      (4L, ts(30), 2L, "view", 4.0, "{}"),
      // second window for user 1 after a > 1h gap: new session
      (5L, ts(130), 1L, "click", 7.0, "{}"),
      // user 9: two provisional sessions 70m apart, bridged by a LATE
      // batch-2 event at m110 — must merge into ONE session
      (7L, ts(80), 9L, "ping", 0.0, "{}"),
      (8L, ts(150), 9L, "ping", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // batch 2: far event advances the watermark; bridge event for user 9
    // (m110 >= batch-1 watermark m100, so it is accepted)
    val late = Seq(
      (6L, ts(10000), 3L, "view", 1.0, "{}"),
      (9L, ts(110), 9L, "ping", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // batch 3: one more far event so the final watermark fires the
    // remaining event-time timeouts
    val flush = Seq((10L, ts(20000), 4L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    early.repartition(1).write.mode("append").parquet(dir)
    late.repartition(1).write.mode("append").parquet(dir)
    flush.repartition(1).write.mode("append").parquet(dir)
  }

  test("watermarked tumbling windows emit final per-window counts") {
    val dir = Files.createTempDirectory("graft_ev_in_").toString
    writeBatches(dir)
    val ckpt = Files.createTempDirectory("graft_ev_ck_").toString
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = EventStream.windowedCounts(stream)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("win_counts")
      .select("w_start", "event_type", "n", "total")
      .as[(Timestamp, String, Long, Double)].collect()
      .map(r => (r._1.getTime, r._2) -> (r._3, r._4)).toMap
    // both early windows are far below the final watermark -> emitted final
    val w0 = ts(0).getTime
    assert(got((w0, "click")) == (3L, 13.5))
    assert(got((w0, "view")) == (1L, 4.0))
    assert(got((w0 + 7200000L, "click")) == (1L, 7.0)) // [t0+2h) window
  }

  test("streaming dedup drops re-delivered event ids within the watermark") {
    val dir = Files.createTempDirectory("graft_dedup_in_").toString
    // batch 1 delivers event 1 twice; batch 2 re-delivers it again
    Seq((1L, ts(0), 1L, "click", 1.0, "{}"), (1L, ts(0), 1L, "click", 1.0, "{}"),
      (2L, ts(1), 1L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("append").parquet(dir)
    Seq((1L, ts(0), 1L, "click", 1.0, "{}"), (3L, ts(2), 2L, "view", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("append").parquet(dir)
    val ckpt = Files.createTempDirectory("graft_dedup_ck_").toString
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = EventStream.dedupStream(stream)
      .writeStream.format("memory").queryName("dedup_ev")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ids = spark.table("dedup_ev").select("event_id").as[Long].collect().sorted
    assert(ids.sameElements(Array(1L, 2L, 3L)), ids.mkString(","))
  }

  test("flatMapGroupsWithState sessionization closes gap-separated sessions") {
    val dir = Files.createTempDirectory("graft_sess_in_").toString
    writeBatches(dir)
    val ckpt = Files.createTempDirectory("graft_sess_ck_").toString
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = EventStream.sessionize(stream).toDF()
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sessions")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // user 1: session [t0, t0+20m] of 3 events, then [t0+130m] of 1
    assert(got((1L, ts(0).getTime)) == (ts(20).getTime, 3L))
    assert(got((1L, ts(130).getTime)) == (ts(130).getTime, 1L))
    // user 2: single-event session
    assert(got((2L, ts(30).getTime)) == (ts(30).getTime, 1L))
    // user 9: the late bridge event MERGED the two provisional sessions —
    // one final session [m80, m150] of 3 events, no spurious split
    assert(got((9L, ts(80).getTime)) == (ts(150).getTime, 3L))
    assert(!got.contains((9L, ts(150).getTime)), "split session leaked")
  }

  test("sessionizeBatch (the driver-oracle replay) == streamed closed sessions") {
    val dir = Files.createTempDirectory("graft_sesseq_in_").toString
    writeBatches(dir)
    val ckpt = Files.createTempDirectory("graft_sesseq_ck_").toString
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = EventStream.sessionize(stream).toDF()
      .writeStream.format("memory").queryName("sessions_eq")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("sessions_eq")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = EventStream.sessionizeBatch(spark.read.parquet(dir))
      .select(col("user_id"), (col("start_us") / 1000).cast("long"),
        (col("end_us") / 1000).cast("long"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    // the stream emits exactly the batch sessions the final watermark
    // closed; the only extra in batch is user 4's still-open last session
    // (user 3's closed too — the batch-3 sentinel advanced the watermark
    // past it)
    assert(streamed.subsetOf(batch), s"streamed not in batch:\n${streamed -- batch}")
    assert((batch -- streamed).forall { case (u, _, _, _) => u == 4L },
      s"unexpected unclosed sessions:\n${batch -- streamed}")
    assert(batch.size == streamed.size + 1)
  }

  test("sessionizeBatch on TIMESTAMP_NTZ is session-timezone invariant") {
    // NTZ naive datetimes must epoch-diff as pure field arithmetic — a
    // cast("timestamp") would shift start_us/end_us by the session offset
    val ntz = Seq((1L, "2024-03-01 00:10:00"), (1L, "2024-03-01 00:20:00"),
      (1L, "2024-03-01 03:00:00"), (2L, "2024-03-01 12:00:00"))
      .toDF("user_id", "s")
      .select(col("user_id"), col("s").cast("timestamp_ntz").as("ts"))
    assert(ntz.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    def run(): Set[(Long, Long, Long, Long)] =
      EventStream.sessionizeBatch(ntz)
        .as[(Long, Long, Long, Long)].collect().toSet
    val tzKey = "spark.sql.session.timeZone"
    val orig = spark.conf.get(tzKey)
    val utc = try { spark.conf.set(tzKey, "UTC"); run() }
      finally spark.conf.set(tzKey, orig)
    val ny = try { spark.conf.set(tzKey, "America/New_York"); run() }
      finally spark.conf.set(tzKey, orig)
    assert(utc == ny, s"session tz shifted the epochs:\nUTC=$utc\nNY =$ny")
    // and the epochs are the naive-as-UTC instants
    assert(utc.exists(_._2 == java.time.LocalDateTime.parse("2024-03-01T00:10")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L))
  }

  test("sub-ms timestamps split sessions identically in stream and batch") {
    // two events exactly gap apart MERGE; gap + 1 µs apart SPLIT. The
    // streaming state must decide in µs like sessionizeBatch — under
    // Timestamp.getTime's ms truncation both pairs look exactly gap
    // apart and the second pair would wrongly merge.
    val dir = Files.createTempDirectory("graft_subms_in_").toString
    val gapUs = 3600000L * 1000L
    def tsUs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000000L * 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val b0 = Base * 1000L + 500L // µs, deliberately off the ms grid
    val early = Seq(
      (1L, tsUs(b0), 1L, "c", 0.0, "{}"),
      (2L, tsUs(b0 + gapUs), 1L, "c", 0.0, "{}"),          // = gap: merge
      (3L, tsUs(b0 + 2 * gapUs + 1L), 1L, "c", 0.0, "{}")) // 1 µs over: split
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val flush = Seq((4L, ts(50000), 4L, "c", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    early.repartition(1).write.mode("append").parquet(dir)
    flush.repartition(1).write.mode("append").parquet(dir)
    val ckpt = Files.createTempDirectory("graft_subms_ck_").toString
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = EventStream.sessionize(stream).toDF()
      .writeStream.format("memory").queryName("sessions_subms")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("sessions_subms")
      .filter(col("user_id") === 1L)
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = EventStream.sessionizeBatch(spark.read.parquet(dir))
      .filter(col("user_id") === 1L)
      .select(col("user_id"), (col("start_us") / 1000).cast("long"),
        (col("end_us") / 1000).cast("long"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    assert(streamed.map(_._4) == Set(2L, 1L), "expected a 2-event and a 1-event session")
  }
}
