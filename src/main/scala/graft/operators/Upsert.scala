package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE-shaped upsert planner (SURVEY.md §2.9, U1–U3): classifies each
  * source row against the current target state as `insert` / `update` /
  * `noop`, with named per-field change predicates — the field-level
  * conditional-PUT logic of the reference's ODS load
  * (dags/ODSImport.py:237-305, :585-660) as a distributed plan.
  *
  * The result is a pure DataFrame; a sink (REST PUT/POST, Delta MERGE, ...)
  * applies it. At scale this is one shuffle on the join key — or zero when
  * the target is bucketed/broadcast — and the diff predicates are plain
  * codegen'd expressions.
  */
object Upsert {

  private val MatchedCol = "__graft_matched"

  /** @param changes name → boolean predicate over joined (source×target)
    *                columns; null for insert rows. `action` = insert when no
    *                target matched, update when any change predicate holds,
    *                else noop.
    */
  def plan(
      source: DataFrame,
      target: DataFrame,
      cond: Column,
      changes: Map[String, Column]): DataFrame = {
    val t = target.withColumn(MatchedCol, lit(true))
    val joined = source.join(t, cond, "left")
    val ordered = changes.toSeq.sortBy(_._1)
    val anyChange = ordered.map(_._2)
      .reduceOption(_ || _).getOrElse(lit(false))
    val withAction = joined.withColumn("action",
      when(col(MatchedCol).isNull, lit("insert"))
        .when(anyChange, lit("update"))
        .otherwise(lit("noop")))
    val withFlags = ordered.foldLeft(withAction) { case (df, (name, pred)) =>
      df.withColumn(name,
        when(col(MatchedCol).isNull, lit(null).cast("boolean"))
          .otherwise(pred))
    }
    withFlags.drop(MatchedCol)
  }

  /** U2 create-only variant (dags/ODSImport.py:432-456): only the insert set. */
  def insertOnly(source: DataFrame, target: DataFrame, cond: Column): DataFrame =
    source.join(target, cond, "left_anti")
}
