package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed stats finalize under watermark in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val df = stream.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowedStats(df, "1 hour", "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("win_out")
      .start()
    try {
      stream.addData(
        (ts("2024-01-01 00:05:00"), "click", 1.0),
        (ts("2024-01-01 00:45:00"), "click", 2.0),
        (ts("2024-01-01 00:50:00"), "view", 5.0))
      q.processAllAvailable()
      // advance event time past the watermark so hour-0 finalizes
      stream.addData((ts("2024-01-01 02:30:00"), "click", 9.0))
      q.processAllAvailable()
      val out = spark.table("win_out")
        .select(col("event_type"), col("n"), col("total_value"))
        .as[(String, Long, Double)].collect().sortBy(_._1)
      assert(out.toSeq == Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val df = stream.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowedStats(df, "1 hour", "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("late_out")
      .start()
    try {
      stream.addData((ts("2024-01-01 00:05:00"), "click", 1.0))
      q.processAllAvailable()
      stream.addData((ts("2024-01-01 03:00:00"), "click", 1.0))
      q.processAllAvailable() // hour-0 closed
      stream.addData((ts("2024-01-01 00:06:00"), "click", 100.0)) // too late
      q.processAllAvailable()
      val hour0 = spark.table("late_out")
        .filter(col("bucket") === ts("2024-01-01 00:00:00"))
        .select(col("n")).as[Long].collect()
      assert(hour0.toSeq == Seq(1L)) // the late row never lands
    } finally q.stop()
  }

  test("batch and streaming share the windowed plan (q30 equivalence)") {
    val batch = Seq(
      (ts("2024-01-01 00:05:00"), "click", 1.0),
      (ts("2024-01-01 00:45:00"), "click", 2.0))
      .toDF("ts", "event_type", "value")
    val out = EventStreams.windowedStats(batch)
      .select(col("bucket"), col("n")).as[(Timestamp, Long)].head()
    assert(out == ((ts("2024-01-01 00:00:00"), 2L)))
  }

  test("sliding windows land each event in len/slide overlapping buckets") {
    val batch = Seq((ts("2024-01-01 01:00:00"), "click", 1.0))
      .toDF("ts", "event_type", "value")
    val buckets = EventStreams.slidingStats(batch)
      .select(col("bucket")).as[Timestamp].collect().sorted.toSeq
    assert(buckets == Seq(ts("2024-01-01 00:15:00"), ts("2024-01-01 00:30:00"),
      ts("2024-01-01 00:45:00"), ts("2024-01-01 01:00:00")))
  }

  test("stream-static enrich joins each micro-batch against the dimension") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val df = stream.toDF().toDF("user_id", "event_type")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = EventStreams.enrich(df, dim, "user_id")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("enrich_out")
      .start()
    try {
      stream.addData((1L, "click"), (3L, "view"))
      q.processAllAvailable()
      val out = spark.table("enrich_out")
        .select(col("user_id"), col("tier"))
        .as[(Long, Option[String])].collect().sortBy(_._1)
      assert(out.toSeq == Seq((1L, Some("gold")), (3L, None)))
    } finally q.stop()
  }

  test("streaming dedup drops repeated event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val df = stream.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStreams.dedupStream(df)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_out")
      .start()
    try {
      stream.addData(
        (1L, ts("2024-01-01 00:00:01"), "a"),
        (1L, ts("2024-01-01 00:00:02"), "a-dup"),
        (2L, ts("2024-01-01 00:00:03"), "b"))
      q.processAllAvailable()
      stream.addData((1L, ts("2024-01-01 00:01:00"), "a-again"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select(col("event_id"))
        .as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L)) // both duplicates suppressed
    } finally q.stop()
  }

  test("stateful sessionization: a late in-watermark event before " +
      "session_start extends the start backwards (q43 parity)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventStreams.sessionizeStream(stream.toDS(),
        watermark = "2 hours")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("late_sess_out")
      .start()
    try {
      stream.addData(Ev(3L, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      // late but within the 2h watermark, 10 min BEFORE the open start
      stream.addData(Ev(3L, ts("2024-01-01 00:50:00")))
      q.processAllAvailable()
      // advance watermark far ahead so the session flushes via timeout
      stream.addData(Ev(4L, ts("2024-01-01 09:00:00")))
      q.processAllAvailable()
      stream.addData(Ev(4L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val sess = spark.table("late_sess_out").as[Session].collect()
        .filter(_.user_id == 3L)
      assert(sess.length == 1)
      assert(sess(0) == Session(3L, ts("2024-01-01 00:50:00"),
        ts("2024-01-01 01:00:00"), 2L)) // start moved back, both counted
    } finally q.stop()
  }

  test("stateful sessionization: late events older than the open session " +
      "gap-merge with each other instead of flushing as singletons") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventStreams.sessionizeStream(stream.toDS(),
        gapSeconds = 30, watermark = "6 hours")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("late_merge_out")
      .start()
    try {
      // open session starts at 01:00:00 with gap 30s
      stream.addData(Ev(5L, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      // two late events, both far older than start-gap, 20s apart:
      // batch gap semantics (q43) puts them in ONE 2-event session
      stream.addData(
        Ev(5L, ts("2024-01-01 00:01:40")),
        Ev(5L, ts("2024-01-01 00:02:00")))
      q.processAllAvailable()
      val closed = spark.table("late_merge_out").as[Session].collect()
        .filter(_.user_id == 5L)
      assert(closed.toSeq == Seq(Session(5L, ts("2024-01-01 00:01:40"),
        ts("2024-01-01 00:02:00"), 2L)))
    } finally q.stop()
  }

  test("stateful sessionization: gap closes a session, timeout flushes " +
      "the idle one, matches q43 gap semantics") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventStreams.sessionizeStream(stream.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_out")
      .start()
    try {
      // user 7: two events 10 min apart (one session), then a 40-min gap
      stream.addData(
        Ev(7L, ts("2024-01-01 00:00:00")),
        Ev(7L, ts("2024-01-01 00:10:00")))
      q.processAllAvailable()
      stream.addData(Ev(7L, ts("2024-01-01 00:50:00"))) // gap > 30 min
      q.processAllAvailable()
      val closed = spark.table("sess_out").as[Session].collect()
      assert(closed.length == 1)
      assert(closed(0) == Session(7L, ts("2024-01-01 00:00:00"),
        ts("2024-01-01 00:10:00"), 2L))
      // push the watermark far past the open session's gap horizon:
      // the event-time timeout fires and flushes it
      stream.addData(Ev(9L, ts("2024-01-01 06:00:00")))
      q.processAllAvailable()
      stream.addData(Ev(9L, ts("2024-01-01 07:00:00")))
      q.processAllAvailable()
      val flushed = spark.table("sess_out").as[Session].collect()
        .filter(s => s.user_id == 7L)
      assert(flushed.map(s => (s.session_start, s.n_events)).toSet ==
        Set((ts("2024-01-01 00:00:00"), 2L), (ts("2024-01-01 00:50:00"), 1L)))
    } finally q.stop()
  }
}
