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
}
