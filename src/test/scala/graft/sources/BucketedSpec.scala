package graft.sources

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Storage-layout contracts: bucketed tables join and aggregate with no
  * exchange; partitioned tables prune directories at planning time. These
  * are the layouts a 100 TB deployment keeps its corpus and indexes in —
  * the gates prove the layout actually deletes the shuffle/scan, not just
  * that the write succeeded.
  */
class BucketedSpec extends SparkSpec {
  import spark.implicits._

  private def explainOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(SimpleMode)

  test("same-key same-count bucketed tables join with ZERO exchange and " +
      "zero sort (pre-sorted buckets)") {
    val docs = Tables.documents(spark, sf())
      .select("doc_id", "lang", "n_chars")
    Bucketed.writeBucketed(docs, "bk_docs", "doc_id", 4)
    Bucketed.writeBucketed(
      docs.select(col("doc_id"), (col("n_chars") * 2).as("score")),
      "bk_scores", "doc_id", 4)
    // broadcast off: on the tiny fixture the planner would broadcast
    // (and rightly disable the bucketed scan); at corpus scale neither
    // side fits — the layout contract under test IS the non-broadcast one
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = Bucketed.read(spark, "bk_docs")
        .join(Bucketed.read(spark, "bk_scores"), "doc_id")
      val p = explainOf(joined)
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$p")
      assert(!p.linesIterator.exists(_.trim.startsWith("Sort ")),
        s"sorted buckets must satisfy the merge-join ordering:\n$p")
      assert(joined.count() == docs.count())
    }
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    Bucketed.writeBucketed(
      Tables.documents(spark, sf()).select("doc_id", "lang"),
      "bk_docs8", "doc_id", 8)
    val joined = Bucketed.read(spark, "bk_docs8")
      .join(Bucketed.read(spark, "bk_scores"), "doc_id")
    // correctness survives layout mismatch (one side re-shuffles)
    assert(joined.count() ==
      Tables.documents(spark, sf()).count())
  }

  test("aggregation on the bucket key needs no exchange") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p = explainOf(Bucketed.read(spark, "bk_docs")
        .groupBy("doc_id").agg(count(lit(1))))
      assert(!p.contains("Exchange"),
        s"bucket-key aggregate must not shuffle:\n$p")
    }
  }

  test("partitioned table prunes directories at planning time") {
    val docs = Tables.documents(spark, sf()).select("doc_id", "text", "lang")
      .filter(col("lang").isNotNull)
    Bucketed.writePartitioned(docs, "pt_docs", Seq("lang"))
    val langs = docs.select("lang").distinct().as[String].collect()
    assert(langs.length > 1, "fixture should have several languages")
    val one = Bucketed.read(spark, "pt_docs").filter(col("lang") === langs.head)
    val p = explainOf(one)
    assert(p.contains("PartitionFilters: [isnotnull(lang"),
      s"expected a planning-time partition filter:\n$p")
    // the pruned scan must NOT carry the lang predicate as a data filter
    assert(!p.contains("PushedFilters: [IsNotNull(lang"),
      s"lang must prune directories, not filter rows:\n$p")
    assert(one.count() ==
      docs.filter(col("lang") === langs.head).count())
  }
}
