package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DistinctCountsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Option[String], Long, Long, Long)] =
    df.collect().map(r => (Option(r.get(0)).map(_.toString),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("bitmapDistinct == countDistinct on random data: nulls, negatives, " +
      "bucket-boundary values, duplicate-heavy keys, NULL group") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map { _ =>
      val g = rnd.nextInt(4) match {
        case 0 => null; case 1 => "a"; case 2 => "b"; case 3 => "c"
      }
      val k1: java.lang.Long = rnd.nextInt(10) match {
        case 0 => null
        case 1 => -1L - rnd.nextInt(100000) // negatives
        case 2 => 32768L * rnd.nextInt(4)   // bucket boundaries
        case _ => rnd.nextInt(200000).toLong
      }
      val k2: java.lang.Long = rnd.nextInt(8) match {
        case 0 => null
        case _ => 10_000_000L * rnd.nextInt(5) + rnd.nextInt(1000) // islands
      }
      (g, k1, k2)
    }
    val df = rows.toDF("g", "k1", "k2")
    val keys = Seq("nd1" -> col("k1"), "nd2" -> col("k2"))
    val got = canon(DistinctCounts.bitmapDistinct(
      df, col("g"), "g", keys, Some("n")))
    val want = canon(DistinctCounts.expandDistinct(
      df, col("g"), "g", keys, Some("n")))
    assert(got == want, s"bitmap $got vs expand $want")
    assert(want.exists(_._1.isEmpty)) // the NULL group is exercised
    // partitioning independence
    assert(canon(DistinctCounts.bitmapDistinct(
      df.repartition(13), col("g"), "g", keys, Some("n"))) == want)
    assert(canon(DistinctCounts.bitmapDistinct(
      df.coalesce(1), col("g"), "g", keys, Some("n"))) == want)
  }

  test("bitmapDistinct: all-NULL key column counts 0 (not NULL); rows " +
      "with NULL keys still count in n and in the other key's distinct") {
    val df = Seq(
      ("x", null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(7L)),
      ("x", null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(7L)),
      ("x", null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(9L)))
      .toDF("g", "k1", "k2")
    val out = DistinctCounts.bitmapDistinct(df, col("g"), "g",
      Seq("nd1" -> col("k1"), "nd2" -> col("k2")), Some("n"))
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 0L && out(0).getLong(2) == 2L &&
      out(0).getLong(3) == 3L)
  }

  test("bitmapDistinct: single key, no row count, integer-typed key") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 5)).toDF("g", "k")
    val got = DistinctCounts.bitmapDistinct(df, col("g"), "g",
      Seq("nd" -> col("k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }

  test("typed bitmap aggregates are byte-identical to the built-ins " +
      "(construct on random positions incl. NULL and boundary bits; " +
      "or over the produced bitmaps) — the layout contract that lets " +
      "bitmap_count and any engine-side consumer read them unchanged") {
    import org.apache.spark.sql.graftbridge.ExprBridge
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map { _ =>
      val g = rnd.nextInt(3)
      val p: java.lang.Long = rnd.nextInt(12) match {
        case 0 => null
        case 1 => 0L
        case 2 => 32767L // last bit of the buffer
        case _ => rnd.nextInt(32768).toLong
      }
      (g, p)
    }
    val df = rows.toDF("g", "p")
    def bytesOf(c: org.apache.spark.sql.Column) =
      df.groupBy("g").agg(c.as("bm")).collect()
        .map(r => r.getInt(0) -> r.getAs[Array[Byte]]("bm").toSeq).toMap
    val builtin = bytesOf(expr("bitmap_construct_agg(p)"))
    val typed = bytesOf(ExprBridge.column(
      graft.functions.BitmapConstructTypedAgg(ExprBridge.expr(col("p")))
        .toAggregateExpression()))
    assert(typed == builtin)
    // or-agg over per-(g, bucket-of-two) bitmaps, merged per g
    val half = df.withColumn("h", col("p") % 2)
    def orBytes(c: org.apache.spark.sql.Column) =
      half.groupBy("g", "h")
        .agg(expr("bitmap_construct_agg(p)").as("bm"))
        .groupBy("g").agg(c.as("bm")).collect()
        .map(r => r.getInt(0) -> r.getAs[Array[Byte]]("bm").toSeq).toMap
    assert(orBytes(ExprBridge.column(
      graft.functions.BitmapOrTypedAgg(ExprBridge.expr(col("bm")))
        .toAggregateExpression())) == orBytes(expr("bitmap_or_agg(bm)")))
  }
}
