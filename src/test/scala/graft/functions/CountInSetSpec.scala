package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ExprBridge

import graft.SparkSpec

/** CountInSetExpr must be indistinguishable from the declarative
  * `size(filter(toks, t -> array_contains(lex, t))).cast("long")` it
  * replaced — same counts, same null contracts — in BOTH the interpreted
  * and codegen paths.
  */
class CountInSetSpec extends SparkSpec {
  import spark.implicits._

  private val lex = Seq("the", "and", "is")

  private def viaExpr(c: org.apache.spark.sql.Column) =
    ExprBridge.column(CountInSetExpr(ExprBridge.expr(c), lex))

  private def viaHof(c: org.apache.spark.sql.Column) = {
    val l = array(lex.map(lit): _*)
    size(filter(c, t => array_contains(l, t))).cast("long")
  }

  test("matches the composed HOF form on hostile inputs (property)") {
    val rnd = new scala.util.Random(11)
    val vocab = Seq("the", "and", "is", "a", "thé", "AND", "", " ", "ист",
      "the ", "änd", null)
    val rows: Seq[Seq[String]] = (1 to 200).map { _ =>
      Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length)))
    } ++ Seq(Seq(), null)
    val df = rows.toDF("tk").cache()
    val got = df.select(viaExpr(col("tk")).as("n")).as[Option[Long]].collect()
    val want = df.select(viaHof(col("tk")).as("n")).as[Option[Long]].collect()
    assert(got.toSeq == want.toSeq)
    // null contracts pinned explicitly: NULL array -> NULL, null elements
    // never match, empty array -> 0
    val byRow = rows.zip(got)
    byRow.foreach { case (r, n) =>
      if (r == null) assert(n.isEmpty)
      else assert(n.contains(r.count(t => t != null && lex.contains(t)).toLong))
    }
  }

  test("stays in whole-stage codegen") {
    // non-foldable input (a literal row would constant-fold to a
    // LocalTableScan and never exercise doGenCode)
    val df = spark.range(4)
      .select(array(lit("the"), concat(lit("x"), col("id")), lit("and"))
        .as("tk"))
      .select(viaExpr(col("tk")).as("n"))
    val plan = df.queryExecution.executedPlan
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      plan.toString)
    assert(df.as[Long].collect().toSeq == Seq(2L, 2L, 2L, 2L))
  }
}
