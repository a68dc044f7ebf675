package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the classic operator Spark's built-in set
  * lacks (pandas has merge_asof; DuckDB has ASOF JOIN). For every left row,
  * attach the latest right row whose timestamp is <= the left timestamp,
  * per key.
  *
  * Implemented Spark-first as union + ordered window with
  * `last_value(ignoreNulls)` over an unbounded-preceding frame:
  * ONE shuffle/sort on (key, time) — no range cross-join, no per-key
  * collect, skew handled by AQE like any other sort. This is the
  * formulation that survives a 100 TB event table; a custom SparkPlan
  * would only change constant factors.
  *
  * Tie semantics: a right row at exactly the left timestamp matches
  * (inclusive, like DuckDB's `ON l.ts >= r.ts`). Right rows should be
  * unique per (key, time) — pre-aggregate otherwise, or the latest-by
  * ordering of `rightOrder` decides.
  */
object AsOfJoin {

  /** @param keys       equi-join key column names (present on both sides)
    * @param leftTime   event-time column name on `left`
    * @param rightTime  event-time column name on `right`
    * @param rightVals  right columns to carry onto left rows (as-of values)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val markedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val markedRight = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))

    // align schemas: left keeps its columns, right contributes only the
    // carried values (renamed), each side null-padding the other's columns
    val carried = rightVals.map(v => s"__asof_$v")
    val alignedLeft = rightVals.foldLeft(markedLeft) { (df, v) =>
      df.withColumn(s"__asof_$v",
        lit(null).cast(right.schema(v).dataType))
    }
    val alignedRight = {
      val base = markedRight.select(
        (keys.map(col) :+ col("__t") :+ col("__side")) ++
          rightVals.map(v => col(v).as(s"__asof_$v")): _*)
      leftCols.filterNot(keys.contains).foldLeft(base) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }
    val unioned = alignedLeft.select(
      (leftCols.map(col) :+ col("__t") :+ col("__side")) ++ carried.map(col): _*)
      .unionByName(alignedRight.select(
        (leftCols.map(col) :+ col("__t") :+ col("__side")) ++ carried.map(col): _*))

    // right rows sort before left rows at equal time → inclusive match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = carried.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val out = filled.filter(col("__side") === 1)
      .drop("__t", "__side")
    carried.zip(rightVals).foldLeft(out) { case (df, (tmp, v)) =>
      df.withColumnRenamed(tmp, s"asof_$v")
    }
  }
}
