package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("groupedKde: matches the brute-force per-group Epanechnikov sum, " +
      "is partitioning-independent (quantized BIGINT sums), excludes " +
      "NULL values, keeps a NULL group, and integrates to ~1 on a " +
      "covering grid") {
    import org.apache.spark.sql.functions.col
    val data = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(2.5)), ("a", Some(7.0)),
      ("b", Some(4.0)), ("b", Some(4.0)), ("b", None),
      (null.asInstanceOf[String], Some(3.0)))
    val df = data.toDF("k", "v")
    val (gridMin, step, points, h) = (-4.0, 0.5, 37, 1.5) // covers [-4, 14]
    def kde(d: org.apache.spark.sql.DataFrame) =
      Stats.groupedKde(d, col("k"), col("v"), gridMin, step, points, h)
        .collect()
        .map(r => ((Option(r.get(0)).map(_.toString), r.getDouble(1)),
          (r.getDouble(2), r.getLong(3)))).toMap
    val got = kde(df)
    // brute force, replaying the quantization exactly
    val vals = data.collect { case (k, Some(x)) => (Option(k), x) }
    for (((k, x0), (density, n)) <- got) {
      val xs = vals.filter(_._1 == k).map(_._2)
      assert(n == xs.length, s"group size for ($k, $x0)")
      val sumQ = xs.map { x =>
        val u = (x0 - x) / h
        math.floor(0.75 * math.max(0.0, 1.0 - u * u) * 1e6 + 0.5).toLong
      }.sum
      assert(density == sumQ.toDouble / 1e6 / (n * h),
        s"density for ($k, $x0)")
    }
    // every group on every grid point, NULL value dropped, NULL group kept
    assert(got.size == 3 * points)
    assert(got.keys.exists(_._1.isEmpty))
    assert(got((Some("b"), 4.0))._2 == 2L) // the None value is excluded
    // a covering grid integrates to ~1 per group (Riemann sum, step=0.5)
    for (g <- Seq(Some("a"), Some("b"))) {
      val mass = got.collect { case ((k, _), (d, _)) if k == g => d }
        .sum * step
      assert(math.abs(mass - 1.0) < 0.05, s"mass($g) = $mass")
    }
    // partitioning independence: the quantized sum can't drift with layout
    assert(kde(df.repartition(7)) == got)
    assert(kde(df.coalesce(1)) == got)
  }

  test("groupedKde: NaN values are excluded like NULLs (an unfiltered " +
      "NaN would throw on the ANSI long cast of floor(NaN))") {
    val df = Seq(("a", 1.0), ("a", Double.NaN), ("a", 2.0)).toDF("k", "v")
    val got = Stats.groupedKde(df, col("k"), col("v"), 0.0, 1.0, 3, 1.5)
      .collect().map(r => r.getDouble(1) -> r.getLong(3)).toMap
    assert(got.values.forall(_ == 2L)) // NaN row dropped, no exception
  }

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
