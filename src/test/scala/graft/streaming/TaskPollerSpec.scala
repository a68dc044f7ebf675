package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.connect.StoreRef

class TaskPollerSpec extends SparkSpec {
  import spark.implicits._

  private def seedTasks(ref: StoreRef): Unit = {
    def task(id: String, status: String, authored: String,
        version: String): String =
      s"""{"resourceType":"Task","id":"$id","status":"$status",
          "authoredOn":"$authored","meta":{"versionId":"$version"},
          "focus":{"identifier":{"system":"sys","value":"enc-$id"}}}"""
    ref.store.update("Task", "a", task("a", "accepted", "2025-07-10T10:00:00", "3"))
    ref.store.update("Task", "b", task("b", "accepted", "2025-07-11T10:00:00", "2"))
    ref.store.update("Task", "c", task("c", "accepted", "2025-07-12T10:00:00", "2000")) // runaway
    ref.store.update("Task", "d", task("d", "completed", "2025-07-12T11:00:00", "1"))
    ref.store.update("Task", "e", task("e", "accepted", "2025-06-01T10:00:00", "1")) // pre-cutoff
  }

  test("poll applies the S5 search shape against the store") {
    val ref = StoreRef("poller-batch")
    seedTasks(ref)
    val polled = TaskPoller.poll(spark, ref, "2025-07-01", count = 5)
      .select("id").as[String].collect()
    assert(polled.toSeq == Seq("b", "a")) // newest first; c/d/e excluded
  }

  test("streaming loop re-polls per trigger and sees store changes") {
    val ref = StoreRef("poller-stream")
    seedTasks(ref)
    implicit val sqlCtx = spark.sqlContext
    val ticks = MemoryStream[Int]
    var polls = Vector.empty[Seq[String]]
    val q = TaskPoller.start(spark, ref, "2025-07-01", count = 5,
      sink = b => polls :+= b.select("id").as[String].collect().toSeq,
      checkpoint = java.nio.file.Files.createTempDirectory("poll-ckpt").toString,
      interval = "1 seconds",
      ticks = Some(ticks.toDF()))
    try {
      ticks.addData(1)
      q.processAllAvailable()
      // the workflow completes task b between polls
      ref.store.update("Task", "b",
        """{"resourceType":"Task","id":"b","status":"completed",
           "authoredOn":"2025-07-11T10:00:00","meta":{"versionId":"3"}}""")
      ticks.addData(2)
      q.processAllAvailable()
      assert(polls.head == Seq("b", "a"))
      assert(polls.last == Seq("a")) // b no longer accepted on re-poll
    } finally q.stop()
  }
}
