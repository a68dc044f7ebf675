package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.connect.StoreRef

/** S5 — the polling Task source as a streaming query: a trigger clock
  * (rate source by default) fires every interval; each micro-batch
  * re-polls the store with the reference's search shape
  * (status=accepted, authored-on cutoff, newest-first top-N, runaway
  * versionId guard — dags/ConsultationNoteWritebackX.py:49,63-96) and
  * hands the polled batch to the sink, which is normally
  * `Writeback.classify` → `taskWriteback`.
  *
  * Poll-per-trigger (not incremental offsets) is deliberate: the
  * reference's queue state lives in the store (tasks change status when
  * processed), so re-polling IS the exactly-once story — X12's
  * visibility-lag note applies unchanged.
  */
object TaskPoller {

  val taskSchema: StructType = StructType(Seq(
    StructField("id", StringType), StructField("status", StringType),
    StructField("authoredOn", StringType),
    StructField("meta", StructType(Seq(
      StructField("versionId", StringType)))),
    StructField("focus", StructType(Seq(
      StructField("identifier", StructType(Seq(
        StructField("system", StringType),
        StructField("value", StringType))))))),
    StructField("note", ArrayType(StructType(Seq(
      StructField("time", StringType), StructField("text", StringType)))))))

  /** One poll: search → parse → the S5 filter/sort/limit shape. */
  def poll(spark: SparkSession, ref: StoreRef, cutoff: String,
      count: Int): DataFrame = {
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val enc: Encoder[String] = Encoders.STRING
    val raw = spark.createDataset(ref.store.search("Task")).toDF("json")
    val parsed = raw.select(from_json(col("json"), taskSchema).as("t"))
      .select(
        col("t.id").as("id"), col("t.status").as("status"),
        coalesce(col("t.meta.versionId"), lit("1")).as("versionId"),
        col("t.authoredOn").as("authoredOn"),
        col("t.focus.identifier.system").as("focusSystem"),
        col("t.focus.identifier.value").as("focusValue"),
        col("t.note").as("note"))
    Writeback.pollFilter(parsed, cutoff, count)
  }

  /** The 1-minute poll loop. `ticks` defaults to a rate source; tests pass
    * a MemoryStream so the loop is fully deterministic.
    */
  def start(spark: SparkSession, ref: StoreRef, cutoff: String,
      count: Int, sink: DataFrame => Unit, checkpoint: String,
      interval: String = "60 seconds",
      ticks: Option[DataFrame] = None): StreamingQuery = {
    val clock = ticks.getOrElse(
      spark.readStream.format("rate").option("rowsPerSecond", "1").load())
    clock.writeStream
      .trigger(Trigger.ProcessingTime(interval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (_: DataFrame, _: Long) =>
        sink(poll(spark, ref, cutoff, count))
      }
      .start()
  }
}
