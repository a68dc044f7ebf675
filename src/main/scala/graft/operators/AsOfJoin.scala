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
  * unique per (key, time) — pre-aggregate otherwise, or pass
  * `rightTieBreak` to resolve duplicates max-wins inside the window's own
  * sort (no pre-aggregation exchange); without either, the union's
  * within-partition order decides which duplicate wins (nondeterministic).
  *
  * Null semantics: carried values are filled as ONE struct, so every
  * `asof_*` column comes from the same matched right row — a right row
  * with a legitimate NULL in one carried column contributes that NULL,
  * never a stale value from an older row (DuckDB ASOF semantics). Rows
  * whose join key OR time is NULL never match: null-key/null-time right
  * rows contribute nothing and null-key/null-time left rows get all-NULL
  * carried values, matching the SQL comparison semantics of the oracle
  * (`NULL <= ts` is NULL — without the guard Spark's NULLS FIRST ordering
  * would sort a null-time left row to the partition front and the forward
  * frame would hand it the earliest right row).
  */
object AsOfJoin {

  /** @param keys       equi-join key column names (present on both sides)
    * @param leftTime   event-time column name on `left`
    * @param rightTime  event-time column name on `right`
    * @param rightVals  right columns to carry onto left rows (as-of values)
    * @param direction  "backward" (latest right at-or-before, default) or
    *                   "forward" (earliest right at-or-after) — both
    *                   inclusive at equal timestamps, matching DuckDB's
    *                   `ON l.ts >= r.ts` / `ON l.ts <= r.ts` forms
    * @param rightTieBreak names (⊆ rightVals) ordering DUPLICATE right rows
    *                   at the same (key, time): the row with the GREATEST
    *                   tie value wins, NULL tie values lose to non-NULL
    *                   (and win only when every dup is NULL) — exactly
    *                   `max()` semantics. This folds the usual
    *                   "pre-aggregate the right side per (key, time)"
    *                   step INTO the window's sort (a few extra sort-key
    *                   bytes), deleting the pre-aggregation's own
    *                   exchange + two HashAggregates from the plan — the
    *                   §2.4 "two operations keyed the same way share one
    *                   exchange" move. Empty (default) keeps the
    *                   documented right-rows-unique contract.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightVals: Seq[String], direction: String = "backward",
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
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

    // backward: right rows sort BEFORE left rows at equal time and the
    // latest prior right row wins (last over preceding frame); forward:
    // right rows sort AFTER left rows at ties and the earliest following
    // right row wins (first over following frame) — inclusive either way
    // tie-break among right dups at one (key, time): backward resolves by
    // `last` (so GREATEST-wins = ascending, nulls first — all-NULL dups
    // still yield NULL), forward by `first` (descending, nulls last);
    // left rows carry NULL in these columns and sort apart by __side, so
    // the keys are inert for them
    require(rightTieBreak.forall(rightVals.contains),
      s"rightTieBreak must name carried rightVals columns: $rightTieBreak")
    val w =
      if (direction == "backward")
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__t") +: col("__side") +:
            rightTieBreak.map(v => col(s"__asof_$v").asc_nulls_first): _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__t") +: col("__side").desc +:
            rightTieBreak.map(v => col(s"__asof_$v").desc_nulls_last): _*)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // pack the carried values into one struct on right rows only (and only
    // when no key is null), so last/first(ignoreNulls) picks the whole
    // matched row atomically instead of filling each column independently
    val anyKeyNull = keys.map(col(_).isNull).reduce(_ || _)
    val packed = unioned.withColumn("__asof_row",
      when(col("__side") === 0 && !anyKeyNull && col("__t").isNotNull,
        struct(carried.map(col): _*)))
    val filled = packed.withColumn("__asof_row",
      if (direction == "backward")
        last(col("__asof_row"), ignoreNulls = true).over(w)
      else first(col("__asof_row"), ignoreNulls = true).over(w))
    val out = filled.filter(col("__side") === 1)
    carried.zip(rightVals).foldLeft(out) { case (df, (tmp, v)) =>
      // a null-time left row must carry nothing (NULL <= ts is NULL in SQL)
      df.withColumn(s"asof_$v",
        when(col("__t").isNotNull, col("__asof_row").getField(tmp)))
    }.drop(("__t" +: "__side" +: "__asof_row" +: carried): _*)
  }
}
