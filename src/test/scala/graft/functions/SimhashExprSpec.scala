package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** Property gate for the fused SimHash projection: per-doc signatures
  * must be ROW-IDENTICAL to the composed explode → saturated-tf →
  * 60-vote aggregate pipeline on hostile text — unicode (case folding,
  * astral planes), repetition past the tf cap, whitespace variants
  * (tabs/newlines/NBSP behavior of \\s+), empty and NULL text (the
  * composed form emits NO row for NULL text; the fused form's NULL
  * filter must reproduce exactly that absence).
  */
class SimhashExprSpec extends SparkSpec {
  import spark.implicits._

  test("fused simhash == composed pipeline per doc (incl. NULL-doc absence)") {
    val rng = new scala.util.Random(41L)
    val words = Seq("the", "THE", "The", "a", "é", "É", "北京", "🎯", "x-1",
      "", "word", "word", "word", "word") // repetition drives the tf cap
    val docs: Seq[Option[String]] = (1 to 500).map { _ =>
      val n = rng.nextInt(60)
      val seps = Seq(" ", "  ", "\t", "\n", " \t ")
      Some((0 until n).map(_ => words(rng.nextInt(words.length)))
        .mkString(seps(rng.nextInt(seps.length))))
    } ++ Seq(None, Some(""), Some("   "), Some("\t\n"), Some("one"),
      Some("Same same SAME sAmE same"))
    val df = docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t.orNull) }.toDF("doc_id", "text")
      .localCheckpoint(true)
    val fused = Dedup.simhash(df, col("doc_id"), col("text"))
    val composed = Dedup.simhashComposed(df, col("doc_id"), col("text"))
    assert(fused.join(composed, Seq("doc_id", "simhash"), "full_outer")
      .count() == fused.count())
    assert(fused.count() == composed.count())
    // NULL text must be ABSENT from both
    assert(fused.count() == docs.count(_.isDefined))
  }
}
