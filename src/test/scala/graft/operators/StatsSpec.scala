package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("grid percentiles: interpolation, duplicates, nulls, single value") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", Some(4.0)),
      ("b", Some(10.0)), ("b", Some(20.0)), ("b", Some(30.0)),
      ("c", Some(7.0)), ("c", None),
      ("d", None))
      .toDF("k", "v")
    val rows = Stats.gridPercentiles(df, "k", "v", Seq("p50" -> 0.5))
      .as[(String, Option[Double])].collect().toMap
    assert(rows("a").contains(2.5)) // even n: midpoint interpolation
    assert(rows("b").contains(20.0)) // odd n: exact middle
    assert(rows("c").contains(7.0)) // nulls excluded, single survivor
    assert(!rows.contains("d")) // all-null group absent by contract
    // duplicated grid values collapse into histogram counts, same result
    val dup = Seq.fill(500)(("a", 1.0)) ++ Seq.fill(500)(("a", 3.0))
    val med = Stats.gridPercentiles(dup.toDF("k", "v"), "k", "v",
      Seq("p50" -> 0.5)).as[(String, Double)].head()
    assert(med == (("a", 2.0)))
  }

  test("selection percentiles match gridPercentiles on every edge shape") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", Some(4.0)),
      ("b", Some(10.0)), ("b", Some(20.0)), ("b", Some(30.0)),
      ("c", Some(7.0)), ("c", None),
      ("d", None))
      .toDF("k", "v")
    for (w <- Seq(0.5, 1.0, 5.0, 1000.0)) { // incl. one-bucket degenerate
      val sel = Stats.selectionPercentiles(df, "k", "v",
        Seq("p50" -> 0.5, "p90" -> 0.9), w)
        .as[(String, Option[Double], Option[Double])].collect().toSet
      val grid = Stats.gridPercentiles(df, "k", "v",
        Seq("p50" -> 0.5, "p90" -> 0.9))
        .as[(String, Option[Double], Option[Double])].collect().toSet
      assert(sel == grid, s"width $w")
    }
  }

  test("multi-column selection matches per-column runs; per-column " +
      "all-NULL group keeps its other columns") {
    val df = Seq(
      ("a", Some(1.0), Some(100.0)), ("a", Some(2.0), Some(200.0)),
      ("a", Some(3.0), None),
      ("b", Some(10.0), None), ("b", Some(20.0), None), // y all NULL
      ("c", None, Some(7.0))) // x all NULL
      .toDF("k", "x", "y")
    val multi = Stats.selectionPercentilesMulti(df, "k", Seq(
      ("x", 2.0, Seq("px" -> 0.5)), ("y", 64.0, Seq("py" -> 0.75))))
      .as[(String, Option[Double], Option[Double])].collect().toSet
    val px = Stats.selectionPercentiles(df, "k", "x", Seq("px" -> 0.5), 2.0)
      .as[(String, Double)].collect().toMap
    val py = Stats.selectionPercentiles(df, "k", "y", Seq("py" -> 0.75), 64.0)
      .as[(String, Double)].collect().toMap
    val expected = (px.keySet ++ py.keySet)
      .map(k => (k, px.get(k), py.get(k)))
    assert(multi == expected)
    assert(multi.exists { case (k, x, y) => k == "b" && x.nonEmpty && y.isEmpty })
  }

  test("gridPercentilesMulti matches per-column gridPercentiles and keeps " +
      "every input key alive (incl. all-NULL keys, which grid drops)") {
    val df = Seq(
      ("a", Some(1.0), Some(100.0)), ("a", Some(2.0), Some(200.0)),
      ("a", Some(3.0), None),
      ("b", Some(10.0), None), ("b", Some(20.0), None), // y all NULL
      ("c", None, Some(7.0)), // x all NULL
      ("d", None, None)) // both all NULL — still a row in the multi form
      .toDF("k", "x", "y")
    val multi = Stats.gridPercentilesMulti(df, "k", Seq(
      ("x", Seq("px" -> 0.5)), ("y", Seq("py" -> 0.25, "py2" -> 0.75))))
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().toSet
    val px = Stats.gridPercentiles(df, "k", "x", Seq("px" -> 0.5))
      .as[(String, Double)].collect().toMap
    val py = Stats.gridPercentiles(df, "k", "y",
        Seq("py" -> 0.25, "py2" -> 0.75))
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val expected = Set("a", "b", "c", "d")
      .map(k => (k, px.get(k), py.get(k).map(_._1), py.get(k).map(_._2)))
    assert(multi == expected)
  }

  test("selection percentiles agree with Spark's exact percentile " +
      "on spread-out and negative values") {
    val vals = (1 to 997).map(i => ("g", (i * i * 7919 % 100003) - 50000.0))
    val df = vals.toDF("k", "v")
    val sel = Stats.selectionPercentiles(df, "k", "v",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p99" -> 0.99), bucketWidth = 1024.0)
      .as[(String, Double, Double, Double)].head()
    val exact = df.groupBy("k")
      .agg(expr("percentile(v, array(0.25, 0.5, 0.99))"))
      .as[(String, Seq[Double])].head()._2
    assert(math.abs(sel._2 - exact(0)) < 1e-6)
    assert(math.abs(sel._3 - exact(1)) < 1e-6)
    assert(math.abs(sel._4 - exact(2)) < 1e-6)
  }

  test("global percentiles emit one ungrouped row") {
    val df = (1 to 101).map(i => i.toDouble).toDF("v")
    val out = Stats.globalPercentiles(df, "v",
      Seq("p25" -> 0.25, "p75" -> 0.75))
    assert(out.columns.toSeq == Seq("p25", "p75"))
    assert(out.as[(Double, Double)].head() == ((26.0, 76.0)))
  }
}
