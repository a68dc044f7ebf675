package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time stream aggregation surface (the scale-up streaming layer the
  * reference's roadmap implies — SURVEY.md §2.10 "reserved for the 100 TB
  * roadmap"): watermarked tumbling-window aggregates and the typed view of
  * the events table. The same plans run batch (q30) and streaming (spec
  * coverage) — Structured Streaming's unified Dataset contract.
  */
object EventStreams {

  /** Watermarked tumbling-window counts+sums per event type. In streaming
    * mode late data beyond `watermark` is dropped and windows finalize
    * incrementally; in batch mode the watermark is a no-op and this is
    * exactly the q30 plan.
    */
  def windowedStats(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("total_value"))

  /** Per-user event counters with state — mapGroupsWithState shape for the
    * custom-state path (kept simple: running count + last seen ts).
    */
  def runningUserCounts(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_seen"))
}
