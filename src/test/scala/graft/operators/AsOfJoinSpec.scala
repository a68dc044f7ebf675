package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof: latest right at-or-before left time, per key; inclusive ties") {
    val quotes = Seq( // key, t, px
      ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 9L, 12.0),
      ("B", 4L, 20.0)).toDF("sym", "qt", "px")
    val trades = Seq( // key, t, qty
      ("A", 0L, 1), // before any quote -> null
      ("A", 5L, 2), // tie: quote at 5 matches (inclusive)
      ("A", 7L, 3), // between 5 and 9 -> 11.0
      ("B", 9L, 4), // after B's only quote -> 20.0
      ("C", 5L, 5)  // key with no quotes -> null
    ).toDF("sym", "tt", "qty")

    val got = AsOfJoin.asofJoin(trades, quotes, keys = Seq("sym"),
        leftTime = "tt", rightTime = "qt", rightVals = Seq("qt", "px"))
      .select("sym", "tt", "qty", "asof_qt", "asof_px")
      .as[(String, Long, Int, Option[Long], Option[Double])]
      .collect().sortBy(r => (r._1, r._2))

    assert(got(0) == (("A", 0L, 1, None, None)))
    assert(got(1) == (("A", 5L, 2, Some(5L), Some(11.0))))
    assert(got(2) == (("A", 7L, 3, Some(5L), Some(11.0))))
    assert(got(3) == (("B", 9L, 4, Some(4L), Some(20.0))))
    assert(got(4) == (("C", 5L, 5, None, None)))
  }

  test("asof: carried values come atomically from the matched row — a " +
      "legit NULL is carried, not back-filled from an older right row") {
    val right = Seq(
      ("A", 1L, Some(10.0), Some("x")),
      ("A", 5L, None, Some("y"))). // later row: px legitimately NULL
      toDF("sym", "qt", "px", "tag")
    val left = Seq(("A", 7L)).toDF("sym", "tt")
    val got = AsOfJoin.asofJoin(left, right, Seq("sym"), "tt", "qt",
        Seq("px", "tag"))
      .select("asof_px", "asof_tag")
      .as[(Option[Double], Option[String])].collect()
    assert(got.toSeq == Seq((None, Some("y")))) // NOT (Some(10.0), Some("y"))
  }

  test("asof: NULL join keys never match (equi-join NULL semantics)") {
    val right = Seq((Option.empty[String], 1L, 10.0), (Some("A"), 1L, 20.0))
      .toDF("sym", "qt", "px")
    val left = Seq((Option.empty[String], 5L), (Some("A"), 5L))
      .toDF("sym", "tt")
    val got = AsOfJoin.asofJoin(left, right, Seq("sym"), "tt", "qt", Seq("px"))
      .select("sym", "asof_px").as[(Option[String], Option[Double])]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq((None, None), (Some("A"), Some(20.0))))
  }

  test("asof forward: earliest right at-or-after left time; inclusive ties") {
    val quotes = Seq(
      ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 9L, 12.0)).toDF("sym", "qt", "px")
    val trades = Seq(
      ("A", 0L, 1),  // before all -> earliest after = qt 1
      ("A", 5L, 2),  // tie: quote at 5 matches (inclusive)
      ("A", 6L, 3),  // between 5 and 9 -> 12.0 at 9
      ("A", 10L, 4)  // after all -> null
    ).toDF("sym", "tt", "qty")
    val got = AsOfJoin.asofJoin(trades, quotes, Seq("sym"), "tt", "qt",
        Seq("qt", "px"), direction = "forward")
      .select("tt", "asof_qt", "asof_px")
      .as[(Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1)
    assert(got(0) == ((0L, Some(1L), Some(10.0))))
    assert(got(1) == ((5L, Some(5L), Some(11.0))))
    assert(got(2) == ((6L, Some(9L), Some(12.0))))
    assert(got(3) == ((10L, None, None)))
  }

  test("asof: NULL timestamps never match in either direction " +
      "(SQL NULL-comparison semantics)") {
    val right = Seq((Some("A"), Option(1L), 10.0),
      (Some("A"), Option.empty[Long], 99.0)).toDF("sym", "qt", "px")
    val left = Seq((Some("A"), Option(5L)), (Some("A"), Option.empty[Long]))
      .toDF("sym", "tt")
    val back = AsOfJoin.asofJoin(left, right, Seq("sym"), "tt", "qt",
        Seq("px")).select("tt", "asof_px")
      .as[(Option[Long], Option[Double])].collect().toMap
    assert(back(Some(5L)) == Some(10.0)) // null-time right row ignored
    assert(back(None).isEmpty)           // null-time left row carries nothing
    val fwd = AsOfJoin.asofJoin(left, right, Seq("sym"), "tt", "qt",
        Seq("px"), direction = "forward").select("tt", "asof_px")
      .as[(Option[Long], Option[Double])].collect().toMap
    assert(fwd(Some(5L)).isEmpty) // no right row at-or-after 5
    assert(fwd(None).isEmpty)     // NOT matched to the earliest right row
  }

  test("asof rightTieBreak == pre-aggregated right side (max per key+time) " +
      "in both directions, on randomized dup-heavy data with NULL values " +
      "and NULL times — the no-pre-agg-exchange q51/q72 rewrite's oracle") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val right = (1 to 3000).map { _ =>
      val v: java.lang.Double =
        if (rnd.nextInt(6) == 0) null else rnd.nextInt(50).toDouble
      val t: java.lang.Long =
        if (rnd.nextInt(20) == 0) null else rnd.nextInt(40).toLong
      (s"k${rnd.nextInt(5)}", t, v) // heavy (key, t) duplication
    }.toDF("sym", "qt", "px").withColumn("q_ts", col("qt"))
    val left = (1 to 500).map { _ =>
      val t: java.lang.Long =
        if (rnd.nextInt(20) == 0) null else rnd.nextInt(45).toLong
      (s"k${rnd.nextInt(6)}", t, rnd.nextInt(1000))
    }.toDF("sym", "tt", "id")
    val preAgg = right.groupBy(col("sym"), col("qt"))
      .agg(max(col("px")).as("px")).withColumn("q_ts", col("qt"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("sym", "tt", "id", "asof_q_ts", "asof_px")
        .as[(String, Option[Long], Int, Option[Long], Option[Double])]
        .collect().sorted.toSeq
    for (dir <- Seq("backward", "forward")) {
      val tied = canon(AsOfJoin.asofJoin(left, right, Seq("sym"), "tt", "qt",
        Seq("q_ts", "px"), direction = dir, rightTieBreak = Seq("px")))
      val agg = canon(AsOfJoin.asofJoin(left, preAgg, Seq("sym"), "tt", "qt",
        Seq("q_ts", "px"), direction = dir))
      assert(tied == agg, s"direction=$dir diverged")
    }
  }

  test("asof preserves left row count (left-outer semantics)") {
    val left = (1 to 100).map(i => ("k", i.toLong, i)).toDF("sym", "tt", "v")
    val right = Seq(("k", 50L, 1.0)).toDF("sym", "qt", "px")
    val out = AsOfJoin.asofJoin(left, right, Seq("sym"), "tt", "qt", Seq("px"))
    assert(out.count() == 100)
    assert(out.filter("asof_px IS NULL").count() == 49) // t=1..49
  }
}
