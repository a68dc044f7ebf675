package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CheckpointBridge

import graft.SparkSpec

/** The partitioning-preserving checkpoint declares a physical layout on
  * a materialized RDD — a WRONG declaration would silently mis-bucket
  * every downstream co-partitioned operator, so the contract gets its
  * own gates beyond the query-level PlanShapeSpec shapes (q122/q123/
  * q113): results must equal the un-checkpointed plan under grouping,
  * key-subset distinct and self-joins; the declared layout must
  * actually eliminate the exchanges; and a plan whose final layout is
  * not a concrete hash partitioning must fail loudly, never declare.
  */
class CheckpointBridgeSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1 to 2000)
    .map(i => (i.toLong % 97, i.toLong, s"v$i")).toDF("k", "v", "s")

  private def nonBroadcastExchanges(d: org.apache.spark.sql.DataFrame): Int =
    d.queryExecution.executedPlan.toString.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("Broadcast"))

  test("groupBy on the checkpointed key plans exchange-free and matches " +
      "the un-checkpointed result") {
    val cp = CheckpointBridge.checkpointPartitioned(
      df.repartition(4, col("k")))
    val agg = cp.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
    assert(nonBroadcastExchanges(agg) == 0,
      s"groupBy must reuse the declared layout:\n${agg.queryExecution}")
    val expect = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(agg.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq == expect)
  }

  test("key-SUBSET clustering: distinct over (k, v) reuses a k-only " +
      "layout; a self-join of two aggregates is exchange-free and exact") {
    val cp = CheckpointBridge.checkpointPartitioned(
      df.repartition(4, col("k")))
    val dist = cp.select("k", "v").distinct()
    assert(nonBroadcastExchanges(dist) == 0,
      "hash(k) clusters (k, v) — the distinct must not re-shuffle")
    assert(dist.count() == 2000)
    val j = cp.groupBy("k").agg(min("v").as("a"))
      .join(cp.groupBy("k").agg(max("v").as("b")), "k")
    assert(nonBroadcastExchanges(j) == 0,
      "both aggregate sides are co-partitioned — the join must not shuffle")
    val got = j.as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.size == 97 && got(0L)._2 == 97L && got.values
      .forall(r => r._2 <= r._3))
  }

  test("multiple consumers see consistent data after filters (the " +
      "newInstance re-aliasing path) and rows survive exactly once") {
    val cp = CheckpointBridge.checkpointPartitioned(
      df.repartition(4, col("k")))
    val a = cp.filter(col("v") % 2 === 0).groupBy("k").count()
    val b = cp.filter(col("v") % 2 =!= 0).groupBy("k").count()
    val total = a.select(sum("count")).as[Long].head() +
      b.select(sum("count")).as[Long].head()
    assert(total == 2000L)
  }

  test("partition-local ordering is carried: a sort-merge-joinable " +
      "window output joins without re-sorting its build side") {
    // window over (k) sorted by (k, v) then checkpointed: ordering prefix
    // (k) should let an SMJ on k skip the build-side sort
    import org.apache.spark.sql.expressions.Window
    val win = df.repartition(4, col("k"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("v"))))
    val cp = CheckpointBridge.checkpointPartitioned(win)
    val probe = df.select(col("k"), col("v").as("v2"))
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = cp.join(probe, Seq("k"))
      val plan = j.queryExecution.executedPlan.toString
      // the checkpointed side must contribute no exchange AND no sort
      val sorts = plan.linesIterator.count(l => l.contains("Sort [k#"))
      assert(nonBroadcastExchanges(j) <= 1, // probe side only
        s"checkpointed side must not re-shuffle:\n$plan")
      // exact expected cardinality Σ_k n_k² from the generated data
      // (residues of i % 97 over 1..2000 are uneven: 60 keys × 21 rows,
      // 37 keys × 20)
      val expectRows = (1 to 2000).groupBy(_ % 97).values
        .map(g => g.size.toLong * g.size).sum
      assert(j.count() == expectRows,
        s"join cardinality ${j.count()} != expected $expectRows")
      assert(sorts <= 1, s"checkpointed side must not re-sort:\n$plan")
    }
  }

  test("a plan that does not end in a concrete hash layout fails loudly " +
      "instead of declaring one") {
    val e = intercept[IllegalArgumentException] {
      CheckpointBridge.checkpointPartitioned(df.coalesce(2))
    }
    assert(e.getMessage.contains("hash"))
  }
}
