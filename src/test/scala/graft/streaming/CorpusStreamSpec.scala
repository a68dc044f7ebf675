package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // 25 tokens (passes the minTokens=20 gate), parameterized head word so
  // fingerprints differ; `flip` permutes word order to exercise the
  // token-BAG fingerprint (same bag => duplicate)
  private def text(head: String, flip: Boolean = false): String = {
    val tail = (1 to 24).map(i => s"w$i")
    val words = if (flip) tail.reverse :+ head else head +: tail
    words.mkString(" ")
  }

  test("enrich gates on token count and fingerprints the token bag") {
    val docs = Seq(
      (1L, ts("2024-01-01 00:00:01"), text("the")),
      (2L, ts("2024-01-01 00:00:02"), "too short"),
      (3L, ts("2024-01-01 00:00:03"), text("the", flip = true)))
      .toDF("doc_id", "ingest_ts", "text")
    val got = CorpusStream.enrich(docs).collect().sortBy(_.doc_id)
    assert(got.map(_.doc_id).toSeq == Seq(1L, 3L)) // doc 2 gated out
    assert(got(0).fp == got(1).fp) // same token bag, different order
    assert(got(0).n_tokens == 25L)
  }

  test("untimed rows (null ingest_ts) are excluded by the quality gate — " +
      "the event-time contract, and they must never NPE the budget gate") {
    val docs = Seq(
      (1L, Some(ts("2024-01-01 00:00:01")), text("the")),
      (2L, None: Option[Timestamp], text("the", flip = true)))
      .toDF("doc_id", "ingest_ts", "text")
    assert(CorpusStream.enrich(docs).collect().map(_.doc_id).toSeq == Seq(1L))
  }

  test("streaming dedup keeps the first arrival of a fingerprint " +
      "within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val docs = stream.toDF().toDF("doc_id", "ingest_ts", "text")
    val q = CorpusStream.dedup(CorpusStream.enrich(docs), "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("corpus_dedup")
      .start()
    try {
      stream.addData((1L, ts("2024-01-01 00:00:01"), text("alpha")))
      q.processAllAvailable()
      // same token bag in a later batch -> dropped; new bag -> kept
      stream.addData(
        (2L, ts("2024-01-01 00:01:00"), text("alpha", flip = true)),
        (3L, ts("2024-01-01 00:01:30"), text("beta")))
      q.processAllAvailable()
      val kept = spark.table("corpus_dedup")
        .select("doc_id").as[Long].collect().sorted
      assert(kept.toSeq == Seq(1L, 3L))
    } finally q.stop()
  }

  test("budget gate admits per-language until the token budget fills, " +
      "carrying the running total across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val docs = stream.toDF().toDF("doc_id", "ingest_ts", "text")
    // every doc is 25 tokens; budget 60 => docs 1,2 admitted (25, 50),
    // doc 3 admitted (total 50 < 60, overflows to 75), doc 4 rejected
    val q = CorpusStream.pipeline(docs, minTokens = 20,
        watermark = "10 minutes", budgetPerLang = 60L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("corpus_budget")
      .start()
    try {
      stream.addData(
        (1L, ts("2024-01-01 00:00:01"), text("the alpha")),
        (2L, ts("2024-01-01 00:00:02"), text("the beta")))
      q.processAllAvailable()
      stream.addData(
        (3L, ts("2024-01-01 00:00:03"), text("the gamma")),
        (4L, ts("2024-01-01 00:00:04"), text("the delta")))
      q.processAllAvailable()
      val got = spark.table("corpus_budget")
        .as[Admission].collect().sortBy(_.doc_id)
      // a rejected doc carries the UNCHANGED consumed total (monotone)
      assert(got.map(a => (a.doc_id, a.cum_tokens, a.admitted)).toSeq ==
        Seq((1L, 26L, true), (2L, 52L, true), (3L, 78L, true),
          (4L, 78L, false)))
    } finally q.stop()
  }

  test("near-dup admission against a static base inside foreachBatch: a " +
      "NEAR copy (not just an exact one) of a base doc is rejected; novel " +
      "docs pass; verdicts are partitioning-independent") {
    implicit val sqlCtx = spark.sqlContext
    val baseText = (1 to 30).map(i => s"base$i").mkString(" ")
    val base = Seq((100L, baseText)).toDF("doc_id", "text")
    // one word changed: near dup (high Jaccard) but NOT an exact
    // fingerprint hit; plus a word-shuffle (exact bag dup) and a novel doc
    val nearText = ((1 to 29).map(i => s"base$i") :+ "changed").mkString(" ")
    val bagText = (1 to 30).map(i => s"base$i").reverse.mkString(" ")
    val novelText = (1 to 30).map(i => s"novel$i").mkString(" ")
    val stream = MemoryStream[(Long, String)]
    val survivors = scala.collection.mutable.ArrayBuffer[Long]()
    val q = stream.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        survivors.synchronized {
          survivors ++= CorpusStream.admitAgainstBase(b, base)
            .select("doc_id").as[Long].collect()
        }
        ()
      }
      .start()
    try {
      stream.addData((1L, nearText), (2L, bagText), (3L, novelText))
      q.processAllAvailable()
    } finally q.stop()
    assert(survivors.sorted.toSeq == Seq(3L),
      s"near dup (1) and bag dup (2) must be rejected, got $survivors")
    // batch-form partitioning independence of the same admission
    val batch = Seq((1L, nearText), (2L, bagText), (3L, novelText))
      .toDF("doc_id", "text")
    val a = CorpusStream.admitAgainstBase(batch, base)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = CorpusStream.admitAgainstBase(batch.repartition(7),
        base.repartition(3))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == Seq(3L) && b == a)
    // the materialized-index form admits identically (base text untouched)
    val dir = java.nio.file.Files.createTempDirectory("admit-index").toString
    graft.operators.Dedup.writeDedupIndex(base,
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text"), dir)
    val c = CorpusStream.admitAgainstIndex(batch, dir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(c == a)
  }

  test("restart recovery: a NEW query resuming from the checkpoint " +
      "carries both state stores — a post-restart word-shuffle of a " +
      "pre-restart doc stays deduped, the budget total continues instead " +
      "of resetting, and consumed files are not replayed") {
    val root = java.nio.file.Files
      .createTempDirectory("corpus-restart").toString
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    val schema = Seq((1L, ts("2024-01-01 00:00:01"), "x"))
      .toDF("doc_id", "ingest_ts", "text").schema
    def addFile(rows: Seq[(Long, Timestamp, String)]): Unit =
      rows.toDF("doc_id", "ingest_ts", "text")
        .coalesce(1).write.mode("append").parquet(srcDir)
    // the memory sink does not support checkpoint recovery; foreachBatch
    // does, and is also the shape the pipeline ships with
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Boolean)]()
    def run() = {
      val docs = spark.readStream.schema(schema).parquet(srcDir)
      CorpusStream.pipeline(docs, minTokens = 20,
          watermark = "10 minutes", budgetPerLang = 60L)
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Admission],
            _: Long) =>
          val rows = b.collect().map(a =>
            (a.doc_id, a.cum_tokens, a.admitted))
          out.synchronized { out ++= rows }
          ()
        }
        .start()
    }
    // epoch 1: two 26-token docs -> totals 26, 52; then STOP the query
    addFile(Seq(
      (1L, ts("2024-01-01 00:00:01"), text("the alpha")),
      (2L, ts("2024-01-01 00:00:02"), text("the beta"))))
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()
    assert(out.sorted.toSeq ==
      Seq((1L, 26L, true), (2L, 52L, true)))
    out.clear()
    // epoch 2, NEW query instance off the same checkpoint: doc 3 is a
    // word-shuffle of doc 1 (same token bag -> dup ACROSS the restart),
    // doc 4 fits the remaining budget, doc 5 arrives after it filled
    addFile(Seq(
      (3L, ts("2024-01-01 00:01:00"), text("the alpha", flip = true)),
      (4L, ts("2024-01-01 00:01:30"), text("the gamma")),
      (5L, ts("2024-01-01 00:02:00"), text("the delta"))))
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    val got2 = out.sorted.toSeq
    // doc 3 absent (dedup state recovered), totals continue from 52
    // (budget state recovered), docs 1/2 absent (offsets recovered)
    assert(got2 == Seq((4L, 78L, true), (5L, 78L, false)),
      s"state recovery broken: $got2")
  }
}
