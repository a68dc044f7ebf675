package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned layout prunes partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("layout").toString + "/evt"
    val df = Seq(
      ("Patient", "2024-01-01", 1), ("Patient", "2024-01-02", 2),
      ("Observation", "2024-01-01", 3))
      .toDF("resourceType", "day", "v")
    Layout.writePartitioned(df, dir, Seq("resourceType", "day"))

    val scan = Layout.readPartitioned(spark, dir)
      .filter(col("resourceType") === "Patient" && col("day") === "2024-01-01")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(scan.select("v").as[Int].collect().toSeq == Seq(1))
  }

  test("co-bucketed join runs with ZERO exchanges (shuffle-free at scale)") {
    val facts = (1 to 1000).map(i => (i.toLong % 50, s"f$i"))
      .toDF("key", "payload")
    val dims = (0 to 49).map(i => (i.toLong, s"d$i")).toDF("key", "tag")
    Layout.writeBucketed(facts, "bk_facts", buckets = 8, Seq("key"))
    Layout.writeBucketed(dims, "bk_dims", buckets = 8, Seq("key"))
    // disable broadcast so the test proves co-location, not broadcast
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
      val joined = spark.table("bk_facts")
        .join(spark.table("bk_dims"), "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // sortBy'd buckets satisfy the merge-join ordering too: the fully
      // exchange-free AND sort-free join
      assert(!plan.linesIterator.exists(_.trim.startsWith("Sort ")),
        s"sorted buckets must satisfy the merge-join ordering:\n$plan")
      assert(joined.count() == 1000)
      // bucket-key aggregation also rides the layout: no exchange
      val aggPlan = spark.table("bk_facts").groupBy("key")
        .agg(count(lit(1))).queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"bucket-key aggregate must not shuffle:\n$aggPlan")
    }
    // mismatched bucket counts still join CORRECTLY (one side re-shuffles)
    Layout.writeBucketed(dims, "bk_dims4", buckets = 4, Seq("key"))
    assert(spark.table("bk_facts")
      .join(spark.table("bk_dims4"), "key").count() == 1000)
    // overwrite survives a stale warehouse location (catalog drop + dir
    // left behind): the DROP-first path must not LOCATION_ALREADY_EXISTS
    Layout.writeBucketed(facts, "bk_facts", buckets = 8, Seq("key"))
    spark.sql("DROP TABLE IF EXISTS bk_facts")
    spark.sql("DROP TABLE IF EXISTS bk_dims")
    spark.sql("DROP TABLE IF EXISTS bk_dims4")
  }

  test("benchLayout reuses the fingerprint-keyed re-layout across calls " +
      "and rebuilds when a source file changes") {
    val src = java.nio.file.Files.createTempDirectory("layout-src")
    // a minimal fixture: every table name must exist for the fingerprint
    // walk, but only ones we read need real content
    Tables.all.foreach { t =>
      Seq((1L, "x")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$src/$t.parquet")
    }
    val a = Layout.benchLayout(spark, src.toString, 2)
    val b = Layout.benchLayout(spark, src.toString, 2)
    assert(a == b, "identical sources must reuse one layout dir")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(a, "_LAYOUT_COMPLETE")))
    // a different cpu count is a different layout
    val c = Layout.benchLayout(spark, src.toString, 3)
    assert(c != a)
    // touching a source file invalidates the fingerprint
    val f = new java.io.File(s"$src/region.parquet")
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    assert(f.setLastModified(f.lastModified() + 60000))
    val d = Layout.benchLayout(spark, src.toString, 2)
    assert(d != a, "changed source mtime must rebuild the layout")
    // the reused layout serves real reads
    assert(Tables.load(spark, d, "region").count() == 1)
    spark.catalog.clearCache()
  }

  test("salted join spreads a hot key and preserves results") {
    val left = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
      .union(Seq(("cold", 0)).toDF("k", "v"))
    val right = Seq(("hot", "H"), ("cold", "C")).toDF("k", "tag")
    val joined = graft.operators.Salt.saltedJoin(left, right, "k", salts = 8)
    assert(joined.count() == 1001)
    assert(joined.filter(col("tag") === "C").count() == 1)
  }

  test("salted count matches plain count") {
    val df = (1 to 500).map(i => if (i % 10 == 0) "a" else "b").toDF("k")
    val salted = graft.operators.Salt.saltedCount(df, "k", salts = 4)
      .as[(String, Long)].collect().toMap
    assert(salted == Map("a" -> 50L, "b" -> 450L))
  }
}
