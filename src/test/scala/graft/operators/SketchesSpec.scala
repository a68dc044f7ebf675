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

  test("heavy hitters finds the dominant keys with shares") {
    val df = (Seq.fill(80)("hot") ++ (1 to 20).map(i => s"cold$i")).toDF("k")
    val hh = Sketches.heavyHitters(df, col("k"), minShare = 0.5)
      .as[(String, Long, Double)].collect()
    assert(hh.length == 1 && hh(0)._1 == "hot" && hh(0)._3 == 0.8)
  }
}
