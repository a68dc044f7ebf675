package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis

/** Property gate for the fused n-gram loop: row-identical to the
  * composed `when/transform(sequence)/concat` chain it replaces, for
  * every n in 1..8, on random token arrays with NULL elements, NULL
  * arrays, empty arrays, <n-token arrays, empty-string tokens and
  * unicode.
  */
class NgramsSpec extends SparkSpec {
  import spark.implicits._

  test("fused == composed for n in 1..8 on hostile token arrays") {
    val rng = new scala.util.Random(29L)
    val vocab = Seq("a", "bb", "", "北", "🎯x", "tok-en", "z" * 40)
    // encode NULL tokens with a sentinel, then nullif() them in-plan so
    // the DataFrame carries real NULL elements
    val rows: Seq[Option[Seq[String]]] =
      (1 to 600).map { _ =>
        val sz = rng.nextInt(12)
        Some((0 until sz).map(_ =>
          if (rng.nextInt(8) == 0) "__NULL__"
          else vocab(rng.nextInt(vocab.length))))
      } ++ Seq(None, Some(Seq.empty[String]), Some(Seq("only")),
        Some(Seq("__NULL__")))
    val df = rows.toDF("raw")
      .select(transform(col("raw"),
        x => when(x === "__NULL__", lit(null)).otherwise(x)).as("tk"))
      // materialize so both sides read the identical array attribute
      .localCheckpoint(true)
    for (n <- 1 to 8) {
      val bad = df.select(
          TextAnalysis.ngrams(col("tk"), n).as("fused"),
          TextAnalysis.ngramsComposed(col("tk"), n).as("composed"))
        .where(!(col("fused") <=> col("composed")))
        .count()
      assert(bad == 0L, s"fused ngrams diverge at n=$n")
    }
  }

  test("fused ngrams stays inside whole-stage codegen") {
    val df = spark.range(10)
      .select(split(col("id").cast("string"), "").as("tk"))
      .select(TextAnalysis.ngrams(col("tk"), 2).as("g"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
      l.contains("*(") && l.contains("ngrams")),
      s"expected ngrams inside WholeStageCodegen:\n$p")
  }
}
