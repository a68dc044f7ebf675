package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.functions.compat
import graft.operators.Stats

/** Relational operator coverage (SURVEY.md §2.2–§2.6, §2.7 scalar surface,
  * §2.9 upsert planning) expressed as idiomatic DataFrame plans over the
  * harness tables. Monetary aggregates run in exact DECIMAL arithmetic and
  * cast to DOUBLE at the end so results are order-independent and
  * bit-identical to the DuckDB oracle regardless of shuffle/partial-agg
  * ordering — a correctness property that must hold on a 1000-executor
  * cluster, not just single-threaded runs.
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  private def dec4(c: Column): Column = c.cast(DecimalType(4, 2))

  // --- A1/A2 aggregation (DiabetesSQL.ipynb:2029-2070 shape; TPC-H Q1 form)
  private val q1_agg = Q(
    run = (s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_shipdate") < lit("2000-06-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount")))
            * (lit(1) + dec4(col("l_tax")))).cast("double").as("sum_charge"),
          (sum(dec4(col("l_discount"))).cast("double") / count(lit(1)))
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    oracle = Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
        count(*) AS count_order
      FROM lineitem WHERE l_shipdate < TIMESTAMP '2000-06-01'
      GROUP BY l_returnflag, l_linestatus"""),
    doc = "A1/A2 grouped aggregation, exact decimal money math")

  // --- P1 projection with aliases + null placeholder (dags/ODSImport.py:120)
  private val q2_proj_alias = Q(
    run = (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey").as("id"),
        col("o_orderstatus").as("status"),
        lit(null).cast("string").as("ods"),
        lit("fhir").as("tag")),
    oracle = Some("""
      SELECT o_orderkey AS id, o_orderstatus AS status,
             CAST(NULL AS VARCHAR) AS ods, 'fhir' AS tag
      FROM orders"""),
    doc = "P1 aliased projection with typed null placeholder")

  // --- P3 coalesce-guard filter (dags/ODSImport.py:122 `IsNull(x,'')<>'US'`)
  private val q3_filter_coalesce = Q(
    run = (s, d) =>
      Tables.customer(s, d)
        .filter(compat.isnull2(col("c_mktsegment"), lit("")) =!= "FURNITURE")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
    oracle = Some("""
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE coalesce(c_mktsegment, '') <> 'FURNITURE'"""),
    doc = "P3/F6 IsNull-guarded inequality filter")

  // --- P4 IRIS `[` contains predicate (DiabetesSQL.ipynb:110-113)
  private val q4_contains = Q(
    run = (s, d) =>
      Tables.part(s, d)
        .filter(compat.containsCode(col("p_type"), "ECON"))
        .select(col("p_partkey"), col("p_name"), col("p_type")),
    oracle = Some("""
      SELECT p_partkey, p_name, p_type FROM part
      WHERE position('ECON' in p_type) > 0"""),
    doc = "P4 contains-code predicate")

  // --- P8/F12/F13 regex predicate + capture (dags/ODSImport.py:129-135)
  private val q5_regex_extract = Q(
    run = (s, d) =>
      Tables.customer(s, d)
        .filter(col("c_name").rlike("^Customer#[0-9]+$"))
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long").as("code")),
    oracle = Some("""
      SELECT c_custkey,
             CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS code
      FROM customer WHERE regexp_matches(c_name, '^Customer#[0-9]+$')"""),
    doc = "P8 regex match + capture-group extraction")

  // --- J1 inner equi-join (resource lookup shape, dags/ODSImport.py:120-121)
  private val q6_join_inner = Q(
    run = (s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      // customer is the small side at every SF → broadcast, no shuffle of orders
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
        .select(
          col("o_orderkey"), col("o_custkey"), col("c_name"),
          col("c_mktsegment"), col("o_orderstatus"))
    },
    oracle = Some("""
      SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_orderstatus
      FROM orders JOIN customer ON o_custkey = c_custkey"""),
    doc = "J1 inner equi-join, broadcast dimension")

  // --- J2 presence flags via 4 guarded left joins (DiabetesSQL.ipynb:101-113)
  //     + F4 CASE + F5 IFNULL3. One scan with conditional agg (the idiomatic
  //     Spark form of four `left join ... and code [ 'x'` probes).
  private val q7_flags = Q(
    run = (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val flags = o.groupBy(col("o_custkey")).agg(
        max(when(compat.containsCode(col("o_orderpriority"), "URGENT"), 1)
          .otherwise(0)).as("urgent"),
        max(when(compat.containsCode(col("o_orderpriority"), "HIGH"), 1)
          .otherwise(0)).as("high"),
        max(when(compat.containsCode(col("o_orderpriority"), "MEDIUM"), 1)
          .otherwise(0)).as("medium"),
        max(when(compat.containsCode(col("o_orderpriority"), "LOW"), 1)
          .otherwise(0)).as("low"))
      c.join(flags, c("c_custkey") === flags("o_custkey"), "left")
        .select(
          col("c_custkey"),
          when(col("c_mktsegment") === "BUILDING", 1)
            .when(col("c_mktsegment") === "FURNITURE", 2)
            .when(col("c_mktsegment") === "MACHINERY", 3)
            .otherwise(9).as("segment_code"),
          compat.ifnull3(col("urgent"), lit(0), col("urgent")).as("urgent"),
          compat.ifnull3(col("high"), lit(0), col("high")).as("high"),
          compat.ifnull3(col("medium"), lit(0), col("medium")).as("medium"),
          compat.ifnull3(col("low"), lit(0), col("low")).as("low"))
    },
    oracle = Some("""
      WITH flags AS (
        SELECT o_custkey,
          max(CASE WHEN position('URGENT' in o_orderpriority) > 0 THEN 1 ELSE 0 END) AS urgent,
          max(CASE WHEN position('HIGH' in o_orderpriority) > 0 THEN 1 ELSE 0 END) AS high,
          max(CASE WHEN position('MEDIUM' in o_orderpriority) > 0 THEN 1 ELSE 0 END) AS medium,
          max(CASE WHEN position('LOW' in o_orderpriority) > 0 THEN 1 ELSE 0 END) AS low
        FROM orders GROUP BY o_custkey)
      SELECT c_custkey,
        CASE c_mktsegment WHEN 'BUILDING' THEN 1 WHEN 'FURNITURE' THEN 2
             WHEN 'MACHINERY' THEN 3 ELSE 9 END AS segment_code,
        CASE WHEN urgent IS NULL THEN 0 ELSE urgent END AS urgent,
        CASE WHEN high IS NULL THEN 0 ELSE high END AS high,
        CASE WHEN medium IS NULL THEN 0 ELSE medium END AS medium,
        CASE WHEN low IS NULL THEN 0 ELSE low END AS low
      FROM customer LEFT JOIN flags ON c_custkey = o_custkey"""),
    doc = "J2 guarded-left-join presence flags + F4 CASE + F5 IFNULL3")

  // --- J3 self-join chain → single-pass conditional pivot agg
  //     (DiabetesSQL.ipynb:2029-2040 LDL×HDL×Total)
  private val q8_cond_agg = Q(
    run = (s, d) =>
      Tables.lineitem(s, d).groupBy(col("l_orderkey")).agg(
        max(when(col("l_returnflag") === "R", dec(col("l_extendedprice"))))
          .cast("double").as("max_r_price"),
        max(when(col("l_returnflag") === "A", dec(col("l_extendedprice"))))
          .cast("double").as("max_a_price"),
        max(when(col("l_returnflag") === "N", dec(col("l_extendedprice"))))
          .cast("double").as("max_n_price")),
    oracle = Some("""
      SELECT l_orderkey,
        CAST(max(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS max_r_price,
        CAST(max(CASE WHEN l_returnflag = 'A' THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS max_a_price,
        CAST(max(CASE WHEN l_returnflag = 'N' THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS max_n_price
      FROM lineitem GROUP BY l_orderkey"""),
    doc = "J3 self-join chain collapsed to one-scan conditional agg")

  // --- J4 left enrichment merge (dags/ODSImport.py:150)
  private val q9_join_left = Q(
    run = (s, d) => {
      val n = Tables.nation(s, d)
      val agg = Tables.customer(s, d).groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"),
          sum(dec(col("c_acctbal"))).cast("double").as("total_bal"))
      n.join(agg, n("n_nationkey") === agg("c_nationkey"), "left")
        .select(col("n_nationkey"), col("n_name"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"),
          coalesce(col("total_bal"), lit(0.0)).as("total_bal"))
    },
    oracle = Some("""
      WITH agg AS (
        SELECT c_nationkey, count(*) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        FROM customer GROUP BY c_nationkey)
      SELECT n_nationkey, n_name,
             coalesce(n_customers, 0) AS n_customers,
             coalesce(total_bal, 0.0) AS total_bal
      FROM nation LEFT JOIN agg ON n_nationkey = c_nationkey"""),
    doc = "J4 left-outer enrichment join")

  // --- J6 composite-key join back onto a per-(part,supp) aggregate
  private val q10_join_composite = Q(
    run = (s, d) => {
      // one shuffle: the correlated per-(part,supp) average via window, not
      // agg+self-join — the follow-up groupBy reuses the same partitioning
      val w = Window.partitionBy(col("l_partkey"), col("l_suppkey"))
      Tables.lineitem(s, d)
        .withColumn("avg_qty",
          sum(dec(col("l_quantity"))).over(w).cast("double") /
            count(lit(1)).over(w))
        .filter(col("l_quantity") > col("avg_qty"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("n_above"))
    },
    oracle = Some("""
      WITH avg_q AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey, l_suppkey)
      SELECT l_partkey, l_suppkey, count(*) AS n_above
      FROM lineitem JOIN avg_q ON l_partkey = pk AND l_suppkey = sk
      WHERE l_quantity > avg_qty
      GROUP BY l_partkey, l_suppkey"""),
    doc = "J6 composite-key join vs correlated aggregate")

  // --- J7 full outer merge (DiabetesSQL.ipynb:2049,2079)
  private val q11_join_outer = Q(
    run = (s, d) => {
      val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk_c"))
        .agg(count(lit(1)).as("n_customers"))
      val sp = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("n_suppliers"))
      c.join(sp, col("nk_c") === col("nk_s"), "full_outer")
        .select(
          coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
    },
    oracle = Some("""
      WITH c AS (SELECT c_nationkey AS nk_c, count(*) AS n_customers
                 FROM customer GROUP BY c_nationkey),
           s AS (SELECT s_nationkey AS nk_s, count(*) AS n_suppliers
                 FROM supplier GROUP BY s_nationkey)
      SELECT coalesce(nk_c, nk_s) AS nationkey,
             coalesce(n_customers, 0) AS n_customers,
             coalesce(n_suppliers, 0) AS n_suppliers
      FROM c FULL OUTER JOIN s ON nk_c = nk_s"""),
    doc = "J7 full outer join of two aggregates")

  // --- J8 existence probe → left semi (duplicate check,
  //     dags/ConsultationNoteWritebackX.py:297-333)
  private val q12_semi = Q(
    run = (s, d) => {
      val c = Tables.customer(s, d)
      val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      c.join(f, c("c_custkey") === f("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    },
    oracle = Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'F')"""),
    doc = "J8 existence probe as left-semi join")

  // --- J8/SO1 anti join (complement)
  private val q13_anti = Q(
    run = (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },
    oracle = Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""),
    doc = "J8 negated existence as left-anti join")

  // --- A3 duplicate detection: group + HAVING count>1
  //     (DeleteDuplicatesinIRISFHIRServer.ipynb:38-40)
  private val q14_having = Q(
    run = (s, d) =>
      Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).as("first_key"),
          max(col("o_orderkey")).as("last_key"))
        .filter(col("n") > 1),
    oracle = Some("""
      SELECT o_custkey, count(*) AS n, min(o_orderkey) AS first_key,
             max(o_orderkey) AS last_key
      FROM orders GROUP BY o_custkey HAVING count(*) > 1"""),
    doc = "A3 duplicate detection via HAVING")

  // --- A3 keep-one variant: row_number window dedup
  private val q15_rownum = Q(
    run = (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    },
    oracle = Some("""
      SELECT o_custkey, o_orderkey, o_orderdate FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) t WHERE rn = 1"""),
    doc = "window row_number keep-latest dedup")

  // --- W4+ running sum per key (ordered series scan with frame)
  private val q16_running = Q(
    run = (s, d) => {
      // quantity/price tiebreakers: the synthetic data carries duplicate
      // (orderkey, linenumber) keys, so the order must be total over
      // values. Every key pins NULLS LAST: Spark's ascending default is
      // nulls FIRST vs DuckDB's nulls LAST, and one NULL shipdate would
      // shift the running sum of every later row in its partition.
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").asc_nulls_last,
          col("l_orderkey").asc_nulls_last,
          col("l_linenumber").asc_nulls_last,
          col("l_quantity").asc_nulls_last,
          col("l_extendedprice").asc_nulls_last)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d).select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(dec(col("l_quantity"))).over(w).cast("double").as("running_qty"))
    },
    oracle = Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber,
        CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) OVER (
          PARTITION BY l_suppkey
          ORDER BY l_shipdate NULLS LAST, l_orderkey NULLS LAST,
                   l_linenumber NULLS LAST, l_quantity NULLS LAST,
                   l_extendedprice NULLS LAST
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS running_qty
      FROM lineitem"""),
    doc = "W4 per-key ordered running aggregate")

  // --- W1 top-k (sort desc + limit, ConsultationNoteWritebackX.py:65-67)
  private val q17_topk = Q(
    run = (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice")),
    oracle = Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""),
    doc = "W1 TakeOrderedAndProject top-k")

  // --- A4 group count (DiabetesSQL.ipynb:1876)
  private val q18_group_count = Q(
    run = (s, d) =>
      Tables.events(s, d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("total_value")),
    oracle = Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY event_type"""),
    doc = "A4 group count + sum")

  // --- A5 grouped distribution → histogram binning
  private val q19_histogram = Q(
    run = (s, d) =>
      Tables.customer(s, d)
        .select(col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bucket"))
        .groupBy(col("c_mktsegment"), col("bucket"))
        .agg(count(lit(1)).as("n")),
    oracle = Some("""
      SELECT c_mktsegment, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bucket,
             count(*) AS n
      FROM customer GROUP BY 1, 2"""),
    doc = "A5 per-group histogram binning")

  // --- A7 median / percentile (DiabetesSQL.ipynb:2450 imputation median)
  //
  // Exact interpolated percentiles WITHOUT Spark's `percentile` aggregate
  // (which buffers every group member in executor memory — an OOM with
  // wide groups at 100×). Both columns go through
  // [[graft.operators.Stats.gridPercentilesMulti]]: ONE unpivoted scan →
  // value-grid histogram → shared cumulative windows → one final
  // aggregation. No second scan, no broadcast-build job, no key-universe
  // re-join (all-NULL keys survive inside the grid) — the whole query is
  // a single job, the fused shape the DuckDB oracle's CTE chain runs.
  // State per group is the DISTINCT-value grid: quantity is integral and
  // price 2dp money, so the grid saturates at the value range and the
  // per-group window stays a bounded fixed cost at any corpus size (the
  // two-pass selection variant remains in Stats for unbounded grids).
  //
  // r12 sf10 floor postmortem (solo, same host window; kept plan 6.4 s):
  // the cost is the grid aggregate itself — (flag, price) hash-agg alone
  // is 4.7 s of the 6.4 (bare 3-col scan 0.29 s) because the price grid
  // is ~594k entries (~row count at sf0.1; 100× duplication at sf10).
  // Measured alternatives, all worse or marginal: two-pass selection
  // 12.0 s (the second scan + candidate stages dominate), joint
  // (flag,qty,price) pre-group before the explode 6.7 s (the explode was
  // never the cost), built-in exact `percentile` OOMs the 8g heap
  // (per-group value maps × 32 tasks), single-long packed key
  // (cents*4+flagid) runs the isolated agg at 2.5 s but needs a
  // dictionary join whose per-row probe over 60M rows plus build/unpack
  // stages eats the ~2 s back at every lower SF. The residual vs DuckDB
  // is its vectorized multi-column hash-agg constant on a ~600k-entry
  // grid — a per-probe constant, not a plan-shape or scale defect.
  private val q20_median = Q(
    run = (s, d) =>
      Stats.gridPercentilesMulti(Tables.lineitem(s, d), "l_returnflag", Seq(
        ("l_quantity", Seq("median_qty" -> 0.5)),
        ("l_extendedprice", Seq("p25_price" -> 0.25, "p75_price" -> 0.75)))),
    oracle = Some("""
      WITH qh AS (
        SELECT l_returnflag AS k, l_quantity AS val, count(*) AS cnt
        FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
      qc AS (
        SELECT k, val,
          sum(cnt) OVER (PARTITION BY k ORDER BY val) AS cum,
          sum(cnt) OVER (PARTITION BY k) AS n
        FROM qh),
      qa AS (
        SELECT k, CAST(max(n) AS DOUBLE) AS n,
          CAST(min(CASE WHEN cum >= floor((n-1)*0.5)+1 THEN val END) AS DOUBLE) AS lo,
          CAST(min(CASE WHEN cum >= floor((n-1)*0.5)+2 THEN val END) AS DOUBLE) AS hi
        FROM qc GROUP BY k),
      qm AS (
        SELECT k, round(CASE WHEN (n-1)*0.5 = floor((n-1)*0.5) THEN lo
          ELSE lo + ((n-1)*0.5 - floor((n-1)*0.5)) * (hi - lo) END, 6)
          AS median_qty
        FROM qa),
      ph AS (
        SELECT l_returnflag AS k, l_extendedprice AS val, count(*) AS cnt
        FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2),
      pc AS (
        SELECT k, val,
          sum(cnt) OVER (PARTITION BY k ORDER BY val) AS cum,
          sum(cnt) OVER (PARTITION BY k) AS n
        FROM ph),
      pa AS (
        SELECT k, CAST(max(n) AS DOUBLE) AS n,
          CAST(min(CASE WHEN cum >= floor((n-1)*0.25)+1 THEN val END) AS DOUBLE) AS lo25,
          CAST(min(CASE WHEN cum >= floor((n-1)*0.25)+2 THEN val END) AS DOUBLE) AS hi25,
          CAST(min(CASE WHEN cum >= floor((n-1)*0.75)+1 THEN val END) AS DOUBLE) AS lo75,
          CAST(min(CASE WHEN cum >= floor((n-1)*0.75)+2 THEN val END) AS DOUBLE) AS hi75
        FROM pc GROUP BY k),
      pm AS (
        SELECT k,
          round(CASE WHEN (n-1)*0.25 = floor((n-1)*0.25) THEN lo25
            ELSE lo25 + ((n-1)*0.25 - floor((n-1)*0.25)) * (hi25 - lo25) END, 6)
            AS p25_price,
          round(CASE WHEN (n-1)*0.75 = floor((n-1)*0.75) THEN lo75
            ELSE lo75 + ((n-1)*0.75 - floor((n-1)*0.75)) * (hi75 - lo75) END, 6)
            AS p75_price
        FROM pa),
      keys AS (SELECT DISTINCT l_returnflag FROM lineitem)
      SELECT keys.l_returnflag, qm.median_qty, pm.p25_price, pm.p75_price
      FROM keys
      LEFT JOIN qm ON keys.l_returnflag IS NOT DISTINCT FROM qm.k
      LEFT JOIN pm ON keys.l_returnflag IS NOT DISTINCT FROM pm.k"""),
    doc = "A7 exact interpolated percentiles (value-grid histogram plan)")

  // --- SO1 EXCEPT complement (DiabetesSQL.ipynb:3223)
  private val q21_except = Q(
    // EXCEPT of two distinct scans = two scans + dedup exchanges + an
    // anti join; the same set is ONE scan + ONE shuffle as a grouped
    // presence test (max-flag per branch) — NULL keys group the same
    // way EXCEPT compares them, so semantics are identical
    run = (s, d) => {
      val e = Tables.events(s, d)
      e.filter(col("event_type").isin("click", "purchase"))
        .groupBy(col("user_id"))
        .agg(
          max(when(col("event_type") === "click", 1).otherwise(0))
            .as("__c"),
          max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("__p"))
        .filter(col("__c") === 1 && col("__p") === 0)
        .select(col("user_id"))
    },
    oracle = Some("""
      SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      EXCEPT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'"""),
    doc = "SO1 set complement via EXCEPT")

  // --- SO3 branch-result union (trigger_rule=one_success merge)
  private val q22_union = Q(
    run = (s, d) => {
      val o = Tables.orders(s, d)
      val hi = o.filter(col("o_totalprice") > 200000)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n")).withColumn("branch", lit("high"))
      val lo = o.filter(col("o_totalprice") <= 200000)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n")).withColumn("branch", lit("low"))
      hi.unionByName(lo)
    },
    oracle = Some("""
      SELECT o_orderstatus, count(*) AS n, 'high' AS branch FROM orders
      WHERE o_totalprice > 200000 GROUP BY o_orderstatus
      UNION ALL
      SELECT o_orderstatus, count(*) AS n, 'low' AS branch FROM orders
      WHERE o_totalprice <= 200000 GROUP BY o_orderstatus"""),
    doc = "SO3 union of branch outputs")

  // --- F1/F2/F3/F16 date functions (calendar-year diff, YYYYMMDD rebuild)
  private val q23_dates = Q(
    run = (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        compat.datediffYears(col("o_orderdate"), lit("2020-06-15").cast("date"))
          .as("years_to_ref"),
        date_format(col("o_orderdate"), "yyyyMMdd").as("compact"),
        compat.yyyymmddToIso(date_format(col("o_orderdate"), "yyyyMMdd"))
          .as("iso_rebuilt"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dd")),
    oracle = Some("""
      SELECT o_orderkey,
        CAST(2020 - year(o_orderdate) AS INTEGER) AS years_to_ref,
        strftime(o_orderdate, '%Y%m%d') AS compact,
        strftime(strptime(strftime(o_orderdate, '%Y%m%d'), '%Y%m%d'),
                 '%Y-%m-%d') AS iso_rebuilt,
        CAST(month(o_orderdate) AS INTEGER) AS m,
        CAST(day(o_orderdate) AS INTEGER) AS dd
      FROM orders"""),
    doc = "F1-F3/F16 calendar-year diff + compact-date rebuild")

  // --- F4/F7/F13/F15 case + $piece + token split
  private val q24_case_piece = Q(
    run = (s, d) => {
      val p = Tables.part(s, d)
        .withColumn("coded",
          concat_ws("|", col("p_brand"), col("p_type"), col("p_name")))
      p.select(
        col("p_partkey"),
        compat.piece(col("coded"), "|", 2).as("piece2"),
        compat.piece(col("coded"), "|", 5).as("piece5"),
        compat.firstToken(col("p_name")).as("first_word"),
        compat.restTokens(col("p_name")).as("rest_words"),
        when(col("p_brand") === "Brand#13", 1)
          .when(col("p_brand") === "Brand#5", 2).otherwise(0).as("brand_code"))
    },
    oracle = Some("""
      SELECT p_partkey,
        split_part(p_brand || '|' || p_type || '|' || p_name, '|', 2) AS piece2,
        split_part(p_brand || '|' || p_type || '|' || p_name, '|', 5) AS piece5,
        regexp_split_to_array(trim(p_name), '\s+')[1] AS first_word,
        array_to_string(regexp_split_to_array(trim(p_name), '\s+')[2:], ' ') AS rest_words,
        CASE p_brand WHEN 'Brand#13' THEN 1 WHEN 'Brand#5' THEN 2 ELSE 0 END AS brand_code
      FROM part"""),
    doc = "F7 $piece + F15 token split + F4 CASE")

  // --- F8/F9 JSON extraction (GetJSON/GetProp over events.props)
  private val q25_json = Q(
    run = (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          compat.getProp(col("props"), "k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n")),
    oracle = Some("""
      SELECT event_type,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             count(*) AS n
      FROM events GROUP BY event_type"""),
    doc = "F8/F9 GetJSON/GetProp scalar extraction")

  // --- F10/F11 restricted FHIRPath over constructed FHIR-shaped JSON.
  //     The JSON doc is assembled identically on both engines, then our
  //     custom Catalyst FhirPathExpr extracts vs DuckDB json_extract.
  private val q26_fhirpath = Q(
    run = (s, d) => {
      val j = concat(
        lit("""{"resourceType":"Task","id":""""), col("o_orderkey"),
        lit("""","subject":{"reference":"Customer/"""), col("o_custkey"),
        lit(""""},"extension":[{"url":"https://graft/priority","valueCode":""""),
        col("o_orderpriority"),
        lit(""""}],"identifier":[{"system":"https://graft/ok","value":""""),
        col("o_orderkey"), lit(""""}]}"""))
      Tables.orders(s, d).withColumn("doc", j).select(
        col("o_orderkey"),
        compat.getFhirPathOne(col("doc"),
          "extension('https://graft/priority').valueCode").as("priority"),
        compat.getFhirPathOne(col("doc"), "subject.reference").as("subject_ref"),
        compat.getFhirPathOne(col("doc"), "identifier[0].value").as("ident0"))
    },
    oracle = Some("""
      WITH docs AS (
        SELECT o_orderkey,
          '{"resourceType":"Task","id":"' || o_orderkey ||
          '","subject":{"reference":"Customer/' || o_custkey ||
          '"},"extension":[{"url":"https://graft/priority","valueCode":"' ||
          o_orderpriority ||
          '"}],"identifier":[{"system":"https://graft/ok","value":"' ||
          o_orderkey || '"}]}' AS doc
        FROM orders)
      SELECT o_orderkey,
        json_extract_string(doc, '$.extension[0].valueCode') AS priority,
        json_extract_string(doc, '$.subject.reference') AS subject_ref,
        json_extract_string(doc, '$.identifier[0].value') AS ident0
      FROM docs"""),
    doc = "F10/F11 GetFHIRPath(One) custom expression vs JSON-path oracle")

  // --- F17/F18/F25/F27 casts, sentinel-replace-fill, rounding
  private val q27_round_cast = Q(
    run = (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        round(dec(col("p_retailprice")), 1).cast("double").as("price_r1"),
        compat.replaceThenFill(
          when(col("p_size") === 24, -1).otherwise(col("p_size")), -1, 0)
          .cast("int").as("size_fixed"),
        col("p_partkey").cast("string").as("key_str"),
        compat.isnull2(col("p_brand").cast("string"), lit("")).as("brand_str")),
    oracle = Some("""
      SELECT p_partkey,
        CAST(round(CAST(p_retailprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS price_r1,
        CAST(coalesce(CASE WHEN (CASE WHEN p_size = 24 THEN -1 ELSE p_size END) = -1
             THEN 0 ELSE p_size END, 0) AS INTEGER) AS size_fixed,
        CAST(p_partkey AS VARCHAR) AS key_str,
        coalesce(CAST(p_brand AS VARCHAR), '') AS brand_str
      FROM part"""),
    doc = "F17/F18/F25 cast + sentinel-fill + decimal-exact rounding")

  // --- F20 one-hot encoding with deterministic column naming
  private val q28_onehot = Q(
    run = (s, d) =>
      Tables.customer(s, d).groupBy(col("c_nationkey")).agg(
        sum(compat.indicator(col("c_mktsegment"), "AUTOMOBILE")).as("seg_automobile"),
        sum(compat.indicator(col("c_mktsegment"), "BUILDING")).as("seg_building"),
        sum(compat.indicator(col("c_mktsegment"), "FURNITURE")).as("seg_furniture"),
        sum(compat.indicator(col("c_mktsegment"), "HOUSEHOLD")).as("seg_household"),
        sum(compat.indicator(col("c_mktsegment"), "MACHINERY")).as("seg_machinery")),
    oracle = Some("""
      SELECT c_nationkey,
        CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS seg_automobile,
        CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS seg_building,
        CAST(sum(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END) AS BIGINT) AS seg_furniture,
        CAST(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END) AS BIGINT) AS seg_household,
        CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS seg_machinery
      FROM customer GROUP BY c_nationkey"""),
    doc = "F20 one-hot indicators, deterministic columns")

  // --- U1 MERGE-shaped upsert action planning (dags/ODSImport.py:237-305):
  //     source rows classified insert / update / noop with per-field
  //     change predicates — the exact Delta MERGE INTO shape.
  private val q29_upsert_actions = Q(
    run = (s, d) => {
      val target = Tables.customer(s, d)
      // synthetic incoming master file: every 3rd key re-priced, plus new keys
      val src = target
        .select(
          col("c_custkey").as("src_key"),
          when(col("c_custkey") % 3 === 0,
            round(dec(col("c_acctbal")) + lit(100), 2))
            .otherwise(dec(col("c_acctbal"))).cast("double").as("src_bal"),
          col("c_mktsegment").as("src_seg"))
        .unionByName(
          target.filter(col("c_custkey") % 10 === 0).select(
            (col("c_custkey") + 1000000).as("src_key"),
            lit(0.0).as("src_bal"), lit("NEW").as("src_seg")))
      graft.operators.Upsert.plan(
        src, target, col("src_key") === col("c_custkey"),
        Map(
          "bal_changed" -> (col("src_bal") =!= col("c_acctbal")),
          "seg_changed" -> (col("src_seg") =!= col("c_mktsegment"))))
        .select(col("src_key"), col("action"),
          col("bal_changed"), col("seg_changed"))
    },
    oracle = Some("""
      WITH src AS (
        SELECT c_custkey AS src_key,
               CAST(CASE WHEN c_custkey % 3 = 0
                 THEN round(CAST(c_acctbal AS DECIMAL(12,2)) + 100, 2)
                 ELSE CAST(c_acctbal AS DECIMAL(12,2)) END AS DOUBLE) AS src_bal,
               c_mktsegment AS src_seg
        FROM customer
        UNION ALL
        SELECT c_custkey + 1000000 AS src_key, 0.0 AS src_bal, 'NEW' AS src_seg
        FROM customer WHERE c_custkey % 10 = 0)
      SELECT src_key,
        CASE WHEN c_custkey IS NULL THEN 'insert'
             WHEN src_bal <> c_acctbal OR src_seg <> c_mktsegment THEN 'update'
             ELSE 'noop' END AS action,
        CASE WHEN c_custkey IS NULL THEN NULL
             ELSE src_bal <> c_acctbal END AS bal_changed,
        CASE WHEN c_custkey IS NULL THEN NULL
             ELSE src_seg <> c_mktsegment END AS seg_changed
      FROM src LEFT JOIN customer ON src_key = c_custkey"""),
    doc = "U1/U3 field-diff MERGE action planner")

  // --- X1-ish batch view of windowed stream agg (tumbling event-time window)
  private val q30_window_tumble = Q(
    run = (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").getField("start").as("bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("total_value")),
    // contract: event-time windowing EXCLUDES untimed rows (Spark's
    // window() drops null timestamps; a null event time can't be
    // watermarked either) — the oracle states it with WHERE ts IS NOT NULL
    oracle = Some("""
      -- ts parity: events.parquet ships TIMESTAMP(MICROS, NTZ) (or NANOS,
      -- harness-dependent); Spark reads it through Tables.events under a
      -- UTC session so wall-clock == instant, DuckDB reads the same file
      -- naively — identical micros values, so the hour buckets align.
      -- Event-time contract: untimed rows are EXCLUDED (ts IS NOT NULL).
      SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2"""),
    doc = "tumbling event-time window aggregate (streaming semantics, batch view)")

  val all: Seq[(String, Q)] = Seq(
    "q1_agg" -> q1_agg,
    "q2_proj_alias" -> q2_proj_alias,
    "q3_filter_coalesce" -> q3_filter_coalesce,
    "q4_contains" -> q4_contains,
    "q5_regex_extract" -> q5_regex_extract,
    "q6_join_inner" -> q6_join_inner,
    "q7_flags" -> q7_flags,
    "q8_cond_agg" -> q8_cond_agg,
    "q9_join_left" -> q9_join_left,
    "q10_join_composite" -> q10_join_composite,
    "q11_join_outer" -> q11_join_outer,
    "q12_semi" -> q12_semi,
    "q13_anti" -> q13_anti,
    "q14_having" -> q14_having,
    "q15_rownum" -> q15_rownum,
    "q16_running" -> q16_running,
    "q17_topk" -> q17_topk,
    "q18_group_count" -> q18_group_count,
    "q19_histogram" -> q19_histogram,
    "q20_median" -> q20_median,
    "q21_except" -> q21_except,
    "q22_union" -> q22_union,
    "q23_dates" -> q23_dates,
    "q24_case_piece" -> q24_case_piece,
    "q25_json" -> q25_json,
    "q26_fhirpath" -> q26_fhirpath,
    "q27_round_cast" -> q27_round_cast,
    "q28_onehot" -> q28_onehot,
    "q29_upsert_actions" -> q29_upsert_actions,
    "q30_window_tumble" -> q30_window_tumble)
}
