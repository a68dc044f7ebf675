package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Diagnostic main: print the formatted physical plan of named manifest
  * queries (all of them with no args) — the plan-shape review loop
  * (`PushedFilters`, `ReadSchema`, broadcast vs shuffle, WholeStageCodegen
  * spans) without editing code.
  *
  * Usage: scripts/run_main.sh graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (dir, names) = args.toSeq match {
      case d +: rest if d.startsWith("/") =>
        (d, if (rest.nonEmpty) rest else SparkEntry.queries.keys.toSeq.sorted)
      case rest =>
        ("/root/testdata/sf0.001",
          if (rest.nonEmpty) rest else SparkEntry.queries.keys.toSeq.sorted)
    }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.Graft.init(spark)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      println(SparkEntry.queries(n)(spark, dir)
        .queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
