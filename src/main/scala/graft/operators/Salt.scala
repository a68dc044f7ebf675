package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md scale notes; the
  * complement to AQE's runtime skew-join splitting when skew is known
  * up front — e.g. a mega-practice organization or a null-heavy key).
  *
  * Left side gets a random salt in [0, n); the (smaller) right side is
  * replicated n ways. The join key becomes (key, salt), spreading each hot
  * key over n reducers. Aggregations over the joined frame are unaffected
  * (salt is dropped).
  */
object Salt {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      (rand(42) * salts).cast("int"))
    val saltedRight = right.crossJoin(
      org.apache.spark.sql.functions.broadcast(
        right.sparkSession.range(salts).select(col("id").cast("int")
          .as("__salt"))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Aggregation-side salting: two-phase groupBy for a skewed grouping key
    * — partial agg on (key, salt), final agg on key. Sum/count compose;
    * use for algebraic aggregates.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("__salt", (rand(42) * salts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
