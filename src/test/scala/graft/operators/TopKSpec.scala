package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val rng = new scala.util.Random(41L)
    (1 to 4000).map { i =>
      val g = s"g${rng.nextInt(17)}"
      // coarse metric → plenty of ties; ~5% nulls
      val m = if (rng.nextInt(20) == 0) None else Some(rng.nextInt(12).toDouble)
      (g, i.toLong, m)
    }.toDF("g", "id", "m")
  }

  test("perGroup(largest) == row_number window (metric DESC NULLS LAST, " +
      "id ASC), incl. ties, null metrics, and groups smaller than k") {
    val df = fixture.cache()
    val got = TopK.perGroup(df, Seq("g"),
        TopK.descByWithIdTieBreak(col("m"), col("id")),
        payload = Seq("id", "m"), k = 5)
      .as[(String, Int, Long, Option[Double])].collect().toSet
    val w = Window.partitionBy(col("g"))
      .orderBy(col("m").desc_nulls_last, col("id"))
    val want = df.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 5)
      .select(col("g"), col("rank"), col("id"), col("m"))
      .as[(String, Int, Long, Option[Double])].collect().toSet
    assert(got == want)
    // a group with fewer than k rows yields all of them
    val tiny = Seq(("only", 1L, Some(1.0))).toDF("g", "id", "m")
    assert(TopK.perGroup(tiny, Seq("g"),
      TopK.descByWithIdTieBreak(col("m"), col("id")),
      payload = Seq("id"), k = 5).count() == 1L)
  }

  test("perGroup(smallest) == ascending row_number; results are " +
      "partitioning-independent") {
    val df = fixture.cache()
    val key = struct(col("m"), col("id"))
    val got = TopK.perGroup(df, Seq("g"), key,
        payload = Seq("id", "m"), k = 3, largest = false)
      .as[(String, Int, Long, Option[Double])].collect().toSet
    // Spark natural ordering: NULLs smallest → asc window nulls FIRST
    val w = Window.partitionBy(col("g")).orderBy(col("m").asc, col("id"))
    val want = df.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 3)
      .select(col("g"), col("rank"), col("id"), col("m"))
      .as[(String, Int, Long, Option[Double])].collect().toSet
    assert(got == want)
    val reshuffled = TopK.perGroup(df.repartition(13, col("m")), Seq("g"),
        key, payload = Seq("id", "m"), k = 3, largest = false)
      .as[(String, Int, Long, Option[Double])].collect().toSet
    assert(reshuffled == got, "top-k must not depend on input partitioning")
  }

  test("argmax == max(struct) on randomized data (ties, NULL metric " +
      "fields, negative ids) and plans ObjectHashAggregate, never the " +
      "input-sorting SortAggregate of the struct-buffered max") {
    val df = fixture.cache()
    val key = struct(col("m"), (-col("id")).as("nid"))
    val got = df.groupBy("g").agg(TopK.argmax(key).as("b"))
      .select(col("g"), col("b.m"), col("b.nid"))
      .as[(String, Option[Double], Long)].collect().toSet
    val want = df.groupBy("g").agg(max(key).as("b"))
      .select(col("g"), col("b.m"), col("b.nid"))
      .as[(String, Option[Double], Long)].collect().toSet
    assert(got == want)
    val p = df.groupBy("g").agg(TopK.argmax(key).as("b"))
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"expected object hash:\n$p")
    assert(!p.contains("SortAggregate"),
      s"argmax fell back to the input-sorting plan:\n$p")
  }

  test("the aggregate is the bounded-heap ObjectHashAggregate with a " +
      "PARTIAL stage — never a sort-the-world window") {
    val df = fixture
    val p = TopK.perGroup(df, Seq("g"),
        TopK.descByWithIdTieBreak(col("m"), col("id")),
        payload = Seq("id"), k = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"),
      s"expected object-hash aggregation:\n$p")
    assert(p.contains("partial_collect_top_k") ||
      (p.contains("partial_") && p.contains("collect_top_k")),
      s"expected map-side partial top-k (shuffle carries <=k per group " +
        s"per partition):\n$p")
    assert(!p.contains("Window"), s"must not fall back to a window:\n$p")
  }
}
