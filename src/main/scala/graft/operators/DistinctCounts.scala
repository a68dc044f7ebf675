package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ExprBridge

import graft.functions.{BitmapConstructTypedAgg, BitmapOrTypedAgg}

/** Exact multi-column distinct counting without the Expand-×(k+1) plan.
  *
  * `count(DISTINCT a), count(DISTINCT b)` in one Aggregate makes Spark
  * replicate every input row once per distinct key (Expand), then hash the
  * replicas on (group, gid, key) — a partial-aggregate hash table with one
  * entry PER DISTINCT KEY VALUE. At 60M rows / 6M distinct keys (q49 at
  * sf10) that is 180M probes into multi-million-entry maps: 9.9 s where
  * DuckDB's vectorized grouped distinct takes 0.8 s.
  *
  * This operator instead rides Spark's bucketed-bitmap mapping
  * (`bitmap_bucket_number` / `bitmap_bit_position`, Spark 3.5+) with the
  * typed aggregates in [[graft.functions.BitmapConstructTypedAgg]] (the
  * built-in `bitmap_construct_agg` is a plain ImperativeAggregate that
  * plans as SortAggregate — see BitmapAggs.scala for the measured cost):
  * each key value maps to (bucket = v div 32768, bit in a 4 KB
  * bitmap), so the ONE scan aggregates on (group, bucket(a), bucket(b))
  * — hundreds of groups, not millions — and per row just sets two bits.
  * The shuffle carries a few hundred 4 KB bitmaps per partition instead of
  * millions of key rows. Downstream of that first aggregate everything is
  * bitmap-sized: the per-key branches explode (×k on ~10³ rows), OR-merge
  * per (group, gid, bucket), popcount, and sum.
  *
  * Exactness: (bucket, bit) ↔ value is a bijection, OR is exact dedup, so
  * the counts equal `count(DISTINCT …)` bit-for-bit — the oracle stays the
  * plain SQL form. NULL keys set no bit (excluded, like count(DISTINCT));
  * the optional row count is `count(*)` riding the same scan.
  *
  * WHEN TO USE — dense-ish integral ids (sequential keys, offset-replica
  * islands): bucket count ≈ key-range / 32768 stays small and the level-1
  * grouping is (|groups| × Π per-key buckets). For SCATTERED 64-bit domains
  * (hashes) every key lands in its own bucket — 4 KB per key — and the
  * classic Expand plan is the right shape instead. The level-1 group count
  * can exceed ObjectHashAggregate's sort-based fallback threshold (default
  * 128), which would silently sort the fact table per partition —
  * [[graft.core.Graft]] raises it session-wide to 4096.
  */
object DistinctCounts {

  /** Per-`grp` exact distinct counts of each `keys` column (output-name →
    * integral key), plus `count(*)` as `rowCount` if set, in one scan.
    * Output columns: `grpName`, then the key names in order, then the row
    * count — all BIGINT, 0 (not NULL) for a group with no non-null keys.
    */
  def bitmapDistinct(df: DataFrame, grp: Column, grpName: String,
      keys: Seq[(String, Column)],
      rowCount: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "bitmapDistinct: at least one key column")
    val ki = keys.indices
    val base = df.select(
      grp.as("__grp") +:
        keys.zipWithIndex.map { case ((_, k), i) => k.as(s"__k$i") }: _*)
    val prepped = base.select(
      col("__grp") +:
        ki.flatMap(i => Seq(
          expr(s"bitmap_bucket_number(__k$i)").as(s"__b$i"),
          expr(s"bitmap_bit_position(__k$i)").as(s"__p$i"))): _*)
    // the ONE pass over the data: few-hundred-group bitmap aggregate.
    // Typed (ObjectHash-eligible) aggregate, NOT the built-in
    // bitmap_construct_agg: the built-in is a plain ImperativeAggregate,
    // which HashAggregate can't buffer and ObjectHashAggregate won't
    // accept without a typed rider — the planner falls to SortAggregate
    // and per-partition-sorts the WHOLE fact input below the partial agg
    // (sf10: 5.4 s sorted vs 2.0 s hashed, identical downstream bytes).
    def constructAgg(pos: String): Column =
      ExprBridge.column(BitmapConstructTypedAgg(
        ExprBridge.expr(col(pos))).toAggregateExpression())
    val lvl1 = prepped
      .groupBy(col("__grp") +: ki.map(i => col(s"__b$i")): _*)
      .agg(
        constructAgg("__p0").as("__bm0"),
        ki.drop(1).map(i =>
          constructAgg(s"__p$i").as(s"__bm$i")) :+
          count(lit(1)).as("__c"): _*)
    // per-key branches as ONE pipeline (an explode, not a self-union —
    // a union would plan the scan subtree once per branch)
    val branches = array(ki.map(i =>
      struct(lit(i).as("gid"), col(s"__b$i").as("b"),
        col(s"__bm$i").as("bm"))): _*)
    val lvl2 = lvl1
      .select(col("__grp"), col("__c"), explode(branches).as("e"))
      .select(col("__grp"), col("__c"), col("e.gid").as("__gid"),
        col("e.b").as("__b"), col("e.bm").as("__bm"))
      .groupBy(col("__grp"), col("__gid"), col("__b"))
      .agg(call_function("bitmap_count", ExprBridge.column(
          BitmapOrTypedAgg(ExprBridge.expr(col("__bm")))
            .toAggregateExpression())).as("__cnt"),
        // each lvl1 row explodes to exactly one gid=0 row, so the row
        // count rides that branch without double-counting
        sum(when(col("__gid") === 0, col("__c"))).as("__cpart"))
    val aggs =
      keys.zipWithIndex.map { case ((name, _), i) =>
        coalesce(sum(when(col("__gid") === i, col("__cnt"))), lit(0L))
          .as(name) } ++
        rowCount.map(n => sum(col("__cpart")).as(n))
    lvl2.groupBy(col("__grp").as(grpName))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The Expand-plan spelling — the equivalence oracle for
    * [[bitmapDistinct]] in specs, and the right shape for scattered
    * (hash-valued) key domains where bucketing degenerates.
    */
  def expandDistinct(df: DataFrame, grp: Column, grpName: String,
      keys: Seq[(String, Column)],
      rowCount: Option[String] = None): DataFrame = {
    val aggs =
      keys.map { case (name, k) => countDistinct(k).as(name) } ++
        rowCount.map(n => count(lit(1)).as(n))
    df.groupBy(grp.as(grpName)).agg(aggs.head, aggs.tail: _*)
  }
}
