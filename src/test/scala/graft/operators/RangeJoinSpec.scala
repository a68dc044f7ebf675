package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(("p1", 5L), ("p2", 450L), ("p3", 919L),
    ("p4", 2500L)).toDF("id", "v")
  private def intervals = Seq(("low", 0L, 450L), ("mid", 450L, 920L),
    ("high", 920L, 2000L)).toDF("band", "lo", "hi")

  test("broadcast point-in-interval: half-open bounds") {
    val got = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi")
      .select("id", "band").as[(String, String)].collect().toMap
    assert(got == Map("p1" -> "low", "p2" -> "mid", "p3" -> "mid"))
    // p4 falls outside every band (inner-join semantics)
  }

  test("binned big-to-big form matches the exact join") {
    val exact = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi")
      .select("id", "band").as[(String, String)].collect().toSet
    for (bw <- Seq(100L, 450L, 1000L)) {
      val binned = RangeJoin.binnedPointInInterval(
        points, "v", intervals, "lo", "hi", binWidth = bw)
        .select("id", "band").as[(String, String)].collect().toSet
      assert(binned == exact, s"binWidth=$bw")
    }
  }
}
