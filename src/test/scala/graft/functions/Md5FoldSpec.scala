package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

class Md5FoldSpec extends SparkSpec {
  import spark.implicits._

  test("fused md5 fold == composed conv(substr(md5)) on random strings, " +
      "unicode, empties, long payloads; NULL -> NULL") {
    val rng = new scala.util.Random(7L)
    val strs = (1 to 2000).map { i =>
      val n = rng.nextInt(200)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        sb.append("aA0 -_.é北🎯\t"(rng.nextInt(11)))
      }
      sb.toString
    } ++ Seq("", " ", "a", "0" * 10000)
    val df = strs.map(Option(_)).:+(Option.empty[String]).toDF("s")
    val disagree = df.select(
        Dedup.portableHash64(col("s")).as("fused"),
        graft.operators.Dedup.portableHash64Composed(col("s"))
          .as("composed"))
      .where(!(col("fused") <=> col("composed")))
      .count()
    assert(disagree == 0L)
    // null propagation + 60-bit range
    val r = df.select(Dedup.portableHash64(col("s")).as("h"))
    assert(r.where(col("h").isNull).count() == 1L)
    assert(r.where(col("h") < 0L || col("h") >= (1L << 60)).count() == 0L)
    // also equal on non-string (numeric cast-to-binary) inputs — the
    // shard/sampling queries hash longs through a string cast upstream,
    // but the expression itself must agree on raw binary too
    val b = (1L to 500L).toDF("x").select(col("x").cast("string").as("s"))
    val d2 = b.select(Dedup.portableHash64(col("s")).as("f"),
        Dedup.portableHash64Composed(col("s")).as("c"))
      .where(col("f") =!= col("c")).count()
    assert(d2 == 0L)
  }

  test("fused fold stays inside whole-stage codegen (no CodegenFallback)") {
    val df = spark.range(10).select(
      Dedup.portableHash64(col("id").cast("string")).as("h"))
    // `*(n)` is the compact whole-stage-codegen marker; the projection
    // carrying md5_fold60 must sit inside one
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
      l.contains("*(") && l.contains("md5_fold60")),
      s"expected the fold inside WholeStageCodegen:\n$p")
  }
}
