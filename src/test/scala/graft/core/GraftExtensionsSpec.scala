package graft.core

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  test("extensions class registers the FHIRPath SQL surface at build time") {
    // build a fresh session (sharing any existing SparkContext) with the
    // extensions applied; never stop() — the context is suite-shared
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("ext-test")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val got = s.sql(
        """SELECT get_fhirpath_one('{"a":[{"b":"x"}]}', 'a[0].b') AS v""")
        .collect().head.getString(0)
      assert(got == "x")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
