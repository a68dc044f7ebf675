package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // source A: 3 docs sharing a footer line (df 3/3 = 100% >= 30%, df >= 2
  // => boilerplate); "rare line" appears in only 1 of 3 (33% >= 30% but
  // df 1 < minDf 2 => kept). source B has ONE doc, so its footer has
  // df 1 < minDf => kept even at 100% frequency.
  private def docs = Seq(
    (1L, "A", "unique alpha content\nCopyright Footer\n\n  Copyright Footer  "),
    (2L, "B", null.asInstanceOf[String]),
    (3L, "A", "unique beta content\nCopyright Footer\nrare line"),
    (4L, "A", "unique gamma content\nCopyright Footer"),
    (5L, "B", "solo doc line\nCopyright Footer"),
    (6L, "A", "   \n\n")
  ).toDF("doc_id", "source", "text")

  private def run() = TextAnalysis.boilerplateLineStats(docs,
      col("doc_id"), col("source"), col("text"), boilerPct = 30, minDf = 2)
    .select("doc_id", "source", "n_lines", "n_boiler", "kept_chars")
    .as[(Long, String, Long, Long, Long)].collect()
    .map(r => r._1 -> r).toMap

  test("per-source df threshold marks the shared footer, counts every " +
      "occurrence, and drops NULL/blank docs") {
    val r = run()
    // doc 1: 3 non-empty lines (footer TWICE — trim collapses the padded
    // copy onto the same line), both occurrences stripped
    assert(r(1L) == ((1L, "A", 3L, 2L, "unique alpha content".length.toLong)))
    // doc 3: rare line is NOT boilerplate (df 1 < minDf)
    assert(r(3L) == ((3L, "A", 3L, 1L,
      ("unique beta content".length + "rare line".length).toLong)))
    assert(r(4L) == ((4L, "A", 2L, 1L, "unique gamma content".length.toLong)))
    // source B: single doc, footer df 1 < minDf => nothing stripped
    assert(r(5L) == ((5L, "B", 2L, 0L,
      ("solo doc line".length + "Copyright Footer".length).toLong)))
    // NULL text and whitespace-only docs produce no row
    assert(!r.contains(2L) && !r.contains(6L))
  }

  test("df is counted per document, not per occurrence") {
    // the footer's THREE occurrences in one doc must count as df 1: with
    // minDf 2 a single spammy doc cannot make its own line boilerplate
    val d = Seq(
      (1L, "S", "x\nspam\nspam\nspam"),
      (2L, "S", "y\nother"),
      (3L, "S", "z\nmore"),
      (4L, "S", "w\nyet"),
      (5L, "S", "v\nlast"),
      (6L, "S", "u\nfinal"),
      (7L, "S", "t\nclose"),
      (8L, "S", "s\nend"),
      (9L, "S", "r\nstop"),
      (10L, "S", "q\ndone")
    ).toDF("doc_id", "source", "text")
    val r = TextAnalysis.boilerplateLineStats(d, col("doc_id"),
        col("source"), col("text"), boilerPct = 30, minDf = 2)
      .agg(sum("n_boiler")).as[Long].head()
    assert(r == 0L)
  }
}
