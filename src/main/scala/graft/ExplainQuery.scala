package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: print the formatted physical plan of one or
  * more declared queries without executing them — the `.explain` loop the
  * plan-shape work runs by hand.
  *
  * Usage: scripts/run_main.sh graft.ExplainQuery <sf_dir> <query>[,query…]
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainQuery <sf_dir> <q1>[,q2…]")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.Graft.init(spark)
    spark.sparkContext.setLogLevel("ERROR")
    args(1).split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      println(s"=== $name ===")
      SparkEntry.queries(name)(spark, args(0)).explain("formatted")
    }
    spark.stop()
  }
}
