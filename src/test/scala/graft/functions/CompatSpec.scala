package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompatSpec extends SparkSpec {
  import spark.implicits._

  test("piece: 1-based, empty on missing, literal delimiter") {
    val df = Seq("a|b|c", "solo", "").toDF("s")
    val got = df.select(
      compat.piece(col("s"), "|", 1),
      compat.piece(col("s"), "|", 2),
      compat.piece(col("s"), "|", 9)).as[(String, String, String)].collect()
    assert(got(0) == (("a", "b", "")))
    assert(got(1) == (("solo", "", "")))
    assert(got(2) == (("", "", "")))
  }

  test("ifnull3 / isnull2") {
    val df = Seq((Some(5), "x"), (None, "y")).toDF("v", "s")
    val got = df.select(
      compat.ifnull3(col("v"), lit(0), lit(1)),
      compat.isnull2(col("v"), lit(-1))).as[(Int, Int)].collect()
    assert(got.toSeq == Seq((1, 5), (0, -1)))
  }

  test("datediffYears is calendar-year subtraction (IRIS semantics)") {
    val df = Seq(("1997-12-31", "1998-01-01"), ("1998-01-01", "1998-12-31"))
      .toDF("a", "b")
    val got = df.select(compat.datediffYears(
      to_date(col("a")), to_date(col("b")))).as[Int].collect()
    assert(got.toSeq == Seq(1, 0)) // one day apart across NYE counts as 1
  }

  test("firstToken / restTokens (given() name splitting)") {
    val df = Seq("KOYA M R", "SINGLE", "  PAD  X  ").toDF("n")
    val got = df.select(
      compat.firstToken(col("n")), compat.restTokens(col("n")))
      .as[(String, String)].collect()
    assert(got.toSeq == Seq(("KOYA", "M R"), ("SINGLE", ""), ("PAD", "X")))
  }

  test("yyyymmddToIso") {
    val got = Seq("19970115").toDF("d")
      .select(compat.yyyymmddToIso(col("d"))).as[String].head()
    assert(got == "1997-01-15")
  }

  test("SQL registration: piece/ifnull3/contains_code usable from spark.sql") {
    val got = spark.sql(
      "SELECT piece('x|y', '|', 2), ifnull3(NULL, 0, 1), " +
        "contains_code('a,b,c', 'b'), datediff_years(DATE'2000-06-01', DATE'2020-01-01')")
      .as[(String, Int, Boolean, Int)].head()
    assert(got == (("y", 0, true, 20)))
  }

  test("replaceThenFill + indicator") {
    val df = Seq(Some(-1), Some(7), None).toDF("v")
    val got = df.select(compat.replaceThenFill(col("v"), -1, 0)).as[Int].collect()
    assert(got.toSeq == Seq(0, 7, 0))
    val ind = Seq("2135-2", "x").toDF("c")
      .select(compat.indicator(col("c"), "2135-2")).as[Int].collect()
    assert(ind.toSeq == Seq(1, 0))
  }
}
