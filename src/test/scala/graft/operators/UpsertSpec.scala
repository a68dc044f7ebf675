package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    ("A", 1.0, "x"), ("B", 2.0, "y"), ("C", 3.0, "z")).toDF("k", "bal", "seg")

  test("identical source is all noop (idempotence)") {
    val src = target.select(col("k").as("sk"), col("bal").as("sb"),
      col("seg").as("ss"))
    val r = Upsert.plan(src, target, col("sk") === col("k"),
      Map("b" -> (col("sb") =!= col("bal")), "s" -> (col("ss") =!= col("seg"))))
    assert(r.filter(col("action") =!= "noop").count() == 0)
  }

  test("classification: insert for unmatched, update iff a field differs") {
    val src = Seq(
      ("A", 1.0, "x"),   // noop
      ("B", 9.0, "y"),   // update (bal)
      ("C", 3.0, "w"),   // update (seg)
      ("D", 0.0, "new")) // insert
      .toDF("sk", "sb", "ss")
    val r = Upsert.plan(src, target, col("sk") === col("k"),
        Map("b" -> (col("sb") =!= col("bal")),
          "s" -> (col("ss") =!= col("seg"))))
      .select("sk", "action", "b", "s")
      .as[(String, String, Option[Boolean], Option[Boolean])]
      .collect().sortBy(_._1)
    assert(r(0) == (("A", "noop", Some(false), Some(false))))
    assert(r(1) == (("B", "update", Some(true), Some(false))))
    assert(r(2) == (("C", "update", Some(false), Some(true))))
    assert(r(3) == (("D", "insert", None, None)))
  }

  test("insertOnly returns exactly the unmatched source rows") {
    val src = Seq(("A", 1), ("D", 4), ("E", 5)).toDF("sk", "v")
    val r = Upsert.insertOnly(src, target, col("sk") === col("k"))
      .select("sk").as[String].collect().sorted
    assert(r.toSeq == Seq("D", "E"))
  }
}
