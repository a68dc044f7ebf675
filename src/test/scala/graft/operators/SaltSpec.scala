package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: one hot key holding ~90% of rows
  private def skewed = (1L to 5000L).map(i =>
    (if (i % 10 == 0) s"k${i % 7}" else "HOT", i)).toDF("k", "v")

  private def dim = Seq(("HOT", "hot-dim"), ("k0", "d0"), ("k3", "d3"))
    .toDF("k", "label")

  test("salted join returns exactly the plain join's rows") {
    val plain = skewed.join(dim, Seq("k"), "inner")
      .select("k", "v", "label").as[(String, Long, String)]
      .collect().sorted
    val salted = Salt.saltedJoin(skewed, dim, "k", salts = 8)
      .select("k", "v", "label").as[(String, Long, String)]
      .collect().sorted
    assert(salted.sameElements(plain))
  }

  test("salted join preserves left-outer semantics") {
    val plain = skewed.join(dim, Seq("k"), "left")
      .select("k", "v", "label").as[(String, Long, String)]
      .collect().sorted
    val salted = Salt.saltedJoin(skewed, dim, "k", salts = 4, "left")
      .select("k", "v", "label").as[(String, Long, String)]
      .collect().sorted
    assert(salted.sameElements(plain))
  }

  test("salted two-phase count equals the plain groupBy count") {
    val plain = skewed.groupBy("k").count()
      .as[(String, Long)].collect().toMap
    val salted = Salt.saltedCount(skewed, "k", salts = 8)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("salting actually spreads the hot key across partial groups") {
    // the partial phase must see >1 distinct (key, salt) group for the
    // hot key — otherwise the salt did nothing for skew
    val partials = skewed
      .withColumn("__salt", (rand(42) * 8).cast("int"))
      .filter(col("k") === "HOT")
      .select("__salt").distinct().count()
    assert(partials > 1)
  }
}
