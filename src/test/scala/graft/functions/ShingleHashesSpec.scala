package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Dedup, TextAnalysis}

/** Property gate for the fused shingle-hash loop: every (portable,
  * distinct) flavor must be ROW-IDENTICAL to the composed
  * `array_distinct(transform(char_shingles(t), hash))` chain it
  * replaces — including the NULL-text ([NULL]-shingle), empty-text,
  * unicode and short-text edge contracts, and first-occurrence dedup
  * order.
  */
class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  private def composed(text: Column, len: Int, stride: Int,
      portable: Boolean, distinct: Boolean): Column = {
    val hash: Column => Column =
      if (portable) Dedup.portableHash64 else (xxhash64(_))
    val mapped = transform(
      TextAnalysis.charShingles(text, len, stride), s => hash(s))
    if (distinct) array_distinct(mapped) else mapped
  }

  private val corpus: Seq[Option[String]] = {
    val rng = new scala.util.Random(13L)
    val alphabet = "ab 0-_.é北🎯\tz"
    val random = (1 to 800).map { _ =>
      val n = rng.nextInt(120)
      Some((0 until n).map(_ => alphabet(rng.nextInt(alphabet.length)))
        .mkString)
    }
    // heavy-repetition strings force real dedup work (equal windows)
    val repeats = (1 to 50).map(i => Some(("abcd" * 40).take(7 + i)))
    random ++ repeats ++ Seq(Some(""), Some(" "), Some("a"),
      Some("x" * 15), Some("y" * 16), Some("z" * 17), None)
  }

  for (portable <- Seq(true, false); distinct <- Seq(true, false)) {
    test(s"fused == composed (portable=$portable, distinct=$distinct, " +
        "len 16 stride 4 + odd 5/3)") {
      val df = corpus.toDF("t")
      for ((len, stride) <- Seq((16, 4), (5, 3))) {
        val bad = df.select(
            Dedup.shingleHashes(col("t"), len, stride, portable, distinct)
              .as("fused"),
            composed(col("t"), len, stride, portable, distinct)
              .as("composed"))
          .where(!(col("fused") <=> col("composed")))
          .count()
        assert(bad == 0L,
          s"fused shingle hashes diverge at len=$len stride=$stride")
      }
    }
  }

  test("fused loop stays inside whole-stage codegen (no CodegenFallback)") {
    val df = spark.range(10).select(
      Dedup.shingleHashes(col("id").cast("string"), 16, 4,
        portable = true, distinct = true).as("h"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
      l.contains("*(") && l.contains("shingle_hashes")),
      s"expected shingle_hashes inside WholeStageCodegen:\n$p")
  }
}
