package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  test("dot_product matches the HOF formulation on float arrays") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    val hof = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)).as[Double].head()
    val fast = df.select(Similarity.dot(col("a"), col("b")))
      .as[Double].head()
    assert(fast == hof && fast == 32.0)
  }

  test("dot_product on double arrays and mixed projection positions") {
    // two instances in ONE projection: locals must not collide in codegen
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val (d1, d2) = df.select(
      Similarity.dot(col("a"), col("b")).as("d1"),
      Similarity.dot(col("b"), col("b")).as("d2"))
      .as[(Double, Double)].head()
    assert(d1 == 11.0 && d2 == 25.0)
  }

  test("dot_product null semantics: null array -> null, null element -> 0") {
    val df = Seq(
      (Some(Seq(Some(1f), Some(2f))), Some(Seq(Some(10f), None))),
      (None, Some(Seq(Some(1f), Some(2f))))
    ).toDF("a", "b")
    val got = df.select(Similarity.dot(col("a"), col("b")))
      .as[Option[Double]].collect()
    assert(got.toSeq == Seq(Some(10.0), None))
  }

  test("dot_product rejects non-array inputs at analysis") {
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[Exception] {
      df.select(Similarity.dot(col("a"), col("b"))).collect()
    }
  }
}
