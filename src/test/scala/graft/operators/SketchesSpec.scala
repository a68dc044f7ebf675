package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL distinct counts land within the rsd bound of exact") {
    val li = Tables.lineitem(spark, sf())
    val approx = Sketches.distinctCounts(li, col("l_returnflag"),
      col("l_orderkey"), rsd = 0.05).as[(String, Long)].collect().toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      val rel = math.abs(approx(k) - n).toDouble / n
      assert(rel <= 0.15, s"$k: approx ${approx(k)} vs exact $n (rel $rel)")
    }
  }

  test("groupedDistinctExactApprox: exact_nd == count(DISTINCT) on hostile " +
      "inputs (NULL group, NULL keys, all-NULL group, bucket boundaries, " +
      "dups), approx within the HLL envelope, partitioning-invariant") {
    val rows: Seq[(String, Option[Long])] =
      (1L to 3000L).map(v => ("big", Some(v))) ++      // spans buckets
      (1L to 3000L).map(v => ("big", Some(v))) ++      // exact dups
      Seq[(String, Option[Long])](
        ("edge", Some(32767L)),                        // last bit of a bucket
        ("edge", Some(32768L)),                        // first bit of the next
        ("edge", Some(0L)),
        ("edge", None),                                // NULL key mixed in
        ("allnull", None), ("allnull", None),          // all-NULL-key group
        (null, Some(7L)),                              // NULL group
        (null, Some(7L)),
        (null, None))
    val df = rows.toDF("g", "v")
    for (parts <- Seq(1, 7)) {
      val got = Sketches
        .groupedDistinctExactApprox(df.repartition(parts), col("g"), col("v"))
        .collect().map(r => (Option(r.getString(0)).getOrElse("<null>"),
          (r.getLong(1), r.getDouble(2)))).toMap
      val want = df.groupBy(col("g")).agg(countDistinct(col("v")))
        .collect().map(r => (Option(r.getString(0)).getOrElse("<null>"),
          r.getLong(1))).toMap
      assert(got.keySet == want.keySet, s"parts=$parts groups")
      want.foreach { case (g, n) =>
        assert(got(g)._1 == n, s"parts=$parts grp=$g exact")
        assert(math.abs(got(g)._2 - n) <= math.max(1.0, n * 0.15),
          s"parts=$parts grp=$g approx ${got(g)._2} vs $n")
      }
    }
  }

  test("approximate quantiles bracket the exact percentiles") {
    val li = Tables.lineitem(spark, sf())
    val qs = Sketches.quantiles(li, col("l_returnflag"), col("l_quantity"),
      Seq(0.5, 0.9)).as[(String, Seq[Double])].collect().toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, array(0.5, 0.9))"))
      .as[(String, Seq[Double])].collect().toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(qs(k)(0) - e(0)) <= math.max(1.0, e(0) * 0.05))
      assert(math.abs(qs(k)(1) - e(1)) <= math.max(1.0, e(1) * 0.05))
    }
  }

  test("KMV distinct estimate lands near exact; small groups are exact") {
    // big group: ~1000 distinct values, estimate within KMV's ~1/sqrt(k)
    // error envelope; small group: fewer than k distincts → exact count
    val df = ((1L to 1000L).map(("big", _)) ++
      (1L to 10L).map(("small", _))).toDF("g", "v")
    val est = Sketches.kmvDistinct(df, col("g"), col("v"), k = 64)
      .as[(String, Long)].collect().toMap
    assert(est("small") == 10L)
    val rel = math.abs(est("big") - 1000L).toDouble / 1000.0
    assert(rel <= 0.35, s"KMV estimate ${est("big")} vs 1000 (rel $rel)")
  }

  test("KMV estimate is invariant to partitioning and duplication") {
    val df = (1L to 500L).map(("g", _)).toDF("g", "v")
    val dup = df.union(df).repartition(13)
    val a = Sketches.kmvDistinct(df, col("g"), col("v"), k = 32)
      .as[(String, Long)].collect().toMap
    val b = Sketches.kmvDistinct(dup, col("g"), col("v"), k = 32)
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }

  test("KMV typed aggregate == the windowed form on randomized corpora, " +
      "and NULL values/all-NULL groups follow the COUNT(DISTINCT) contract") {
    val rnd = new scala.util.Random(42)
    // skewed duplicates, many groups, group sizes straddling k
    val rows = (1 to 20000).map { _ =>
      val g = s"g${rnd.nextInt(7)}"
      (g, Some(math.abs(rnd.nextLong()) % (1L << rnd.nextInt(16))))
    } ++ Seq(("gnull", Option.empty[Long]), ("g0", Option.empty[Long]))
    val df = rows.toDF("g", "v").repartition(11)
    for (k <- Seq(2, 16, 64)) {
      val a = Sketches.kmvDistinct(df, col("g"), col("v"), k)
        .as[(String, Long)].collect().toMap
      val b = Sketches.kmvDistinctWindowed(df, col("g"), col("v"), k)
        .as[(String, Long)].collect().toMap
      assert(a == b, s"k=$k: agg form $a vs windowed $b")
      assert(!a.contains("gnull"), "all-NULL group must vanish")
    }
  }

  test("portable HLL lands within the standard error envelope of exact") {
    // p=8 → 256 registers → standard error 1.04/sqrt(256) ≈ 6.5%; allow 3σ
    val li = Tables.lineitem(spark, sf())
    val est = Sketches.hllPortable(li, col("l_returnflag"),
      col("l_orderkey")).as[(String, Long)].collect().toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      val rel = math.abs(est(k) - n).toDouble / n
      assert(rel <= 0.20, s"$k: portable HLL ${est(k)} vs exact $n ($rel)")
    }
  }

  test("portable HLL small cardinalities hit the linear-counting branch") {
    // 5 distinct values in 256 registers → V≈251 → 256·ln(256/V) ≈ 5
    val df = (1L to 5L).flatMap(v => Seq(("g", v), ("g", v))).toDF("g", "v")
    val est = Sketches.hllPortable(df, col("g"), col("v"))
      .as[(String, Long)].collect().toMap
    assert(math.abs(est("g") - 5L) <= 1, s"got ${est("g")}")
  }

  test("portable HLL excludes NULL values and is duplication-invariant") {
    val df = ((1L to 300L).map(v => ("g", Some(v))) ++
      Seq(("g", None), ("onlynull", None)))
      .toDF("g", "v")
    val dup = df.union(df).repartition(7)
    val a = Sketches.hllPortable(df, col("g"), col("v"))
      .as[(String, Long)].collect().toMap
    val b = Sketches.hllPortable(dup, col("g"), col("v"))
      .as[(String, Long)].collect().toMap
    assert(a == b)
    assert(!a.contains("onlynull"), "all-NULL group must vanish")
    val rel = math.abs(a("g") - 300L).toDouble / 300.0
    assert(rel <= 0.20, s"portable HLL ${a("g")} vs 300 ($rel)")
  }

  test("hllJoinPreflight: per-side, union and overlap estimates track " +
      "truth; disjoint sides estimate ~zero overlap") {
    import org.apache.spark.sql.DataFrame
    def prefl(l: DataFrame, r: DataFrame) =
      Sketches.hllJoinPreflight(l, col("k"), r, col("k"))
        .as[(Long, Long, Long, Long)].head()
    // 600 shared keys + 400 left-only + 400 right-only
    val left = ((1 to 600) ++ (1001 to 1400)).map(_.toLong).toDF("k")
    val right = ((1 to 600) ++ (2001 to 2400)).map(_.toLong).toDF("k")
    val (nl, nr, un, in_) = prefl(left, right)
    def rel(got: Long, want: Long) =
      math.abs(got - want).toDouble / want
    assert(rel(nl, 1000) <= 0.15, s"left $nl vs 1000")
    assert(rel(nr, 1000) <= 0.15, s"right $nr vs 1000")
    assert(rel(un, 1400) <= 0.15, s"union $un vs 1400")
    assert(rel(in_, 600) <= 0.35, s"overlap $in_ vs 600")
    // disjoint sides: overlap estimate collapses toward 0 (clamped)
    val (_, _, _, dj) = prefl(left,
      (5001 to 6000).map(_.toLong).toDF("k"))
    assert(dj <= 120, s"disjoint overlap too high: $dj")
  }

  test("heavy hitters finds the dominant keys with shares") {
    val df = (Seq.fill(80)("hot") ++ (1 to 20).map(i => s"cold$i")).toDF("k")
    val hh = Sketches.heavyHitters(df, col("k"), minShare = 0.5)
      .as[(String, Long, Double)].collect()
    assert(hh.length == 1 && hh(0)._1 == "hot" && hh(0)._3 == 0.8)
  }
}
