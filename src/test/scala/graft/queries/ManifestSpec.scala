package graft.queries

import graft.SparkSpec

/** Smoke: every declared query plans and executes at sf0.001; oracle SQL
  * exists for every SQL-expressible entry; flagship entry returns rows.
  * (Value-level correctness is the driver's DuckDB compare — replayed
  * locally via scripts/check_oracle.py.)
  */
class ManifestSpec extends SparkSpec {

  test("flagship entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("manifest names are unique and oracle keys are a subset") {
    val names = Manifest.all.map(_._1)
    assert(names.distinct.size == names.size)
    assert(Manifest.oracleSql.keySet.subsetOf(names.toSet))
  }

  Manifest.all.foreach { case (name, q) =>
    test(s"$name executes at sf0.001") {
      val df = q.run(spark, sf())
      assert(df.columns.nonEmpty)
      df.write.format("noop").mode("overwrite").save()
    }
  }
}
