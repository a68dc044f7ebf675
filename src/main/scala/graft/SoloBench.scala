package graft

import org.apache.spark.sql.SparkSession

/** Solo-profile declared queries: 3 noop-sink passes each, no pool
  * concurrency — par=5 Bench numbers include contention, so plan tuning
  * must be judged here (full projections execute, unlike RunQuery's
  * `count()` which lets Catalyst prune them).
  *
  * Usage: scripts/run_main.sh graft.SoloBench <sf_dir> <query>[,query…]
  */
object SoloBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SoloBench <sf_dir> <q1>[,q2…]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.Graft.init(spark)
    spark.sparkContext.setLogLevel("ERROR")
    // same storage layout + cache warm as the graded Bench run — the raw
    // one-row-group fixture runs scan-rooted maps single-core and would
    // misattribute fixture artifacts to the plan under tuning
    val benchDir = graft.core.Layout.benchLayout(spark, args(0), cpus.toInt)
    // same pass-boundary checkpoint sweep as Bench: each pass rebuilds
    // its DataFrames, so prior passes' localCheckpoint blocks are garbage
    // that would otherwise squeeze the storage pool
    val baselineRdds = spark.sparkContext.getPersistentRDDs.keySet
    args(1).split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, benchDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!baselineRdds.contains(id)) rdd.unpersist(blocking = false)
        }
        dt
      }
      println(f"$name%-24s best ${times.min}%6.2f s  passes ${
        times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
