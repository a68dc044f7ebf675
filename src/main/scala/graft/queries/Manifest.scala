package graft.queries

/** The declared-query manifest: every SURVEY.md §2 operator that is "done"
  * appears here with its Spark plan and (where SQL-expressible) the DuckDB
  * oracle. SparkEntry exposes this to the driver.
  */
object Manifest {
  val all: Seq[(String, Q)] =
    Relational.all ++ Advanced.all ++ TextOps.all ++ VectorOps.all ++
      Extended.all ++ Transforms.all

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] =
    all.map { case (n, q) => n -> q.run }.toMap

  def oracleSql: Map[String, String] =
    all.collect { case (n, Q(_, Some(sql), _)) => n -> sql.trim }.toMap
}
