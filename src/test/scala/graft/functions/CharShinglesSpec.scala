package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The codegen'd shingle expression must be indistinguishable from the
  * declarative form it replaced — same windows, same edge contracts
  * (NULL text → [NULL], empty → [""], codepoint addressing) — across
  * arbitrary strings, lens and strides, on both the codegen and
  * interpreted eval paths.
  */
class CharShinglesSpec extends SparkSpec {

  /** The original composition charShingles replaced (TextAnalysis @ r4). */
  private def composedShingles(text: Column, len: Int, stride: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - (len - 1), lit(1)), lit(stride)),
      i => text.substr(i, lit(len)))

  private def run(texts: Seq[String], len: Int, stride: Int): Unit = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val df = spark.createDataFrame(texts.map(t => Row(t)).asJava, schema)
    val got = df.select(
      graft.operators.TextAnalysis.charShingles(col("text"), len, stride)
        .as("sh")).collect().map(_.getSeq[String](0))
    val want = df.select(
      composedShingles(col("text"), len, stride).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(got.toSeq.map(_.toList) === want.toSeq.map(_.toList),
      s"len=$len stride=$stride texts=${texts.take(3)}")
  }

  test("pinned edges: null, empty, short, exact-window, unicode") {
    val texts = Seq(
      null, "", "a", "x" * 15, "x" * 16, "x" * 17, "x" * 20, "x" * 21,
      "héllo wörld ünïcode — ∂éjà vu œuf", // multi-byte codepoints
      "日本語のテキストです、これは長めの一行。",
      "a b c\td\ne",            // exotic whitespace left intact
      "😀emoji🎉 surrogate pairs stretch bytes",
      " leading and trailing  ",
      "x" * 100)
    run(texts, 16, 4)
    run(texts, 16, 1)
    run(texts, 3, 4)
    run(texts, 1, 1)
  }

  test("property: matches the composed form on arbitrary strings") {
    val genText: Gen[String] = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf(
        Gen.alphaNumChar, Gen.const(' '), Gen.const('é'), Gen.const('中'),
        Gen.const('\n'))).map(_.mkString))
    val caseGen = for {
      texts <- Gen.listOfN(12, genText)
      len <- Gen.choose(1, 20)
      stride <- Gen.choose(1, 6)
    } yield (texts, len, stride)
    // scalatestplus isn't in the offline cache; deterministic seed loop
    (1 to 40).foreach { i =>
      caseGen(Gen.Parameters.default.withSize(24), Seed(i.toLong)).foreach {
        case (texts, len, stride) => run(texts, len, stride)
      }
    }
  }

  test("interpreted eval path (no codegen) agrees") {
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      run(Seq(null, "", "hello world this is a doc", "日本語テキスト"), 16, 4)
    }
  }

  test("real corpus: sf0.001 documents produce identical shingle arrays") {
    val docs = graft.core.Tables.documents(spark, sf())
    val diff = docs.select(
        graft.operators.TextAnalysis.charShingles(col("text")).as("a"),
        composedShingles(col("text"), 16, 4).as("b"))
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(diff === 0L)
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val old = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
