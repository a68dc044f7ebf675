package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Partitioning-preserving local checkpoint.
  *
  * `Dataset.localCheckpoint` in this Spark build wraps the materialized
  * RDD in a `LogicalRDD` WITHOUT an output partitioning (measured: a
  * groupBy over a checkpointed `repartition(n, key)` re-shuffles), so a
  * relation that several key-clustered consumers share pays its exchange
  * once per consumer unless ReuseExchange happens to cover the subtree —
  * and ReuseExchange can't cover it when Catalyst pushes consumer
  * filters below the repartition, specializing each copy (the q122
  * funnel shape).
  *
  * [[checkpointHashPartitioned]] re-does what `Dataset.localCheckpoint`
  * does — materialize the physical RDD, pin it in block storage — but
  * constructs the `LogicalRDD` with the `HashPartitioning` the plan just
  * produced, so every downstream operator that needs only that key
  * clustering (groupBy on the key, equi-join on the key, distinct on a
  * superset of the key) plans exchange-FREE.
  *
  * CONTRACT (asserted): the DataFrame's physical plan must END in an
  * exact `repartition(numPartitions, keys…)` — an EXPLICIT partition
  * count, because AQE never coalesces user-specified counts, so the
  * materialized layout is bit-exactly `HashPartitioning(keys, n)` with
  * partition INDEX = `pmod(murmur3(keys), n)`. Declaring any other
  * layout would silently mis-bucket every downstream co-partitioned
  * operator, so the helper re-derives the partitioning from the plan's
  * own `outputPartitioning` rather than trusting the caller.
  */
object CheckpointBridge {

  /** Materialize `df` to local block storage (memory, spill to disk) and
    * return a Dataset whose relation advertises the hash partitioning
    * `df`'s plan ends in. Fails loudly if the plan does not end in an
    * explicit-count hash repartition.
    */
  def checkpointHashPartitioned(
      df0: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val df = df0.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    val spark = df.sparkSession
    val qe = df.queryExecution
    // resolve through AQE: executedPlan is AdaptiveSparkPlanExec; its
    // outputPartitioning only stabilizes once the plan is final, so
    // check the user intent on the OPTIMIZED logical plan instead —
    // RepartitionByExpression with an explicit numPartitions is exactly
    // the case AQE will not touch.
    val part = qe.optimizedPlan match {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
          if r.optNumPartitions.isDefined =>
        HashPartitioning(r.partitionExpressions, r.optNumPartitions.get)
      case other => throw new IllegalArgumentException(
        "checkpointHashPartitioned: plan must end in repartition(n, keys), got " +
          other.nodeName)
    }
    val rdd = qe.toRdd.map(_.copy())
    rdd.persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count() // materialize eagerly, like localCheckpoint(true)
    val output: Seq[Attribute] = qe.analyzed.output
    // rebase the partitioning expressions onto the LogicalRDD's output
    // attributes (same exprIds as the analyzed output, so a direct reuse
    // is sound; LogicalRDD.newInstance re-maps them per consumer)
    val plan = LogicalRDD(output, rdd, part, Nil, isStreaming = false)(spark)
    Dataset.ofRows(spark, plan)
  }
}
