package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range / interval joins at scale.
  *
  * Spark plans a plain `l.p BETWEEN r.lo AND r.hi` join as a (broadcast)
  * nested loop — fine when one side is a small dimension, quadratic when
  * both sides are large. [[binnedPointInInterval]] is the standard bin
  * optimization: intervals are exploded onto fixed-width bins, points
  * hash-join on their bin, and the exact predicate filters residually —
  * an equi-shuffle whose fan-out is interval_width/bin_width, not |L|·|R|.
  */
object RangeJoin {

  /** Small-dimension form: plain theta join; Catalyst broadcasts. */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String): DataFrame =
    points.join(broadcast(intervals),
      col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))

  /** Big-to-big form: bin both sides on `binWidth`, equi-join on the bin,
    * filter the exact containment. Interval columns must be numeric
    * (cast timestamps to epoch first).
    */
  def binnedPointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    val binned = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    points
      .withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
      .join(binned, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }
}
