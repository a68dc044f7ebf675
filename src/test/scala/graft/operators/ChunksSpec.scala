package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunksSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], size: Int, overlap: Int) =
    TextAnalysis.chunks(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), size, overlap)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
      .sortBy(c => (c._1, c._2))

  test("windows advance by stride, overlap by `overlap`, and cover " +
      "every token exactly") {
    val text = (1 to 11).map(i => s"t$i").mkString(" ")
    val out = run(Seq(1L -> text), 4, 2)
    // starts: 0,2,4,6,8 (grid caps at n_tok-overlap-1 = 8)
    assert(out.map(_._3) == Seq(0L, 2L, 4L, 6L, 8L))
    assert(out.map(_._2) == Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.map(_._4) == Seq(4L, 4L, 4L, 4L, 3L)) // tail clamps
    assert(out.head._5 == "t1 t2 t3 t4")
    assert(out.last._5 == "t9 t10 t11")
    // coverage: every token index appears in >= 1 window
    val covered = out.flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered == (0L until 11L).toSet)
  }

  test("short doc emits exactly one window; exact-multiple length has " +
      "no redundant tail") {
    assert(run(Seq(1L -> "a b"), 4, 2) ==
      Seq((1L, 0L, 0L, 2L, "a b")))
    // n_tok = 6 with size 4 / stride 2: starts 0,2 — a start at 4 would
    // be a suffix already covered by [2,5]
    val out = run(Seq(1L -> "a b c d e f"), 4, 2)
    assert(out.map(_._3) == Seq(0L, 2L))
    assert(out.last._5 == "c d e f")
  }

  test("NULL and whitespace-only text emit no chunks") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "   "), (3L, "x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunks(docs, col("doc_id"), col("text"), 8, 2)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq((3L, 0L, 0L, 1L, "x")))
  }

  test("zero overlap partitions the tokens disjointly") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = run(Seq(1L -> text), 3, 0)
    assert(out.map(_._3) == Seq(0L, 3L, 6L, 9L))
    val slices = out.flatMap(c => c._3 until (c._3 + c._4))
    assert(slices == (0L until 10L)) // each token exactly once, in order
  }

  test("maxChunksPerDoc fuse: pathological doc keeps its first windows, " +
      "prefix-stable under a raised cap") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val docs = Seq(1L -> text).toDF("doc_id", "text")
    def capped(cap: Int) =
      TextAnalysis.chunks(docs, col("doc_id"), col("text"), 4, 2,
          maxChunksPerDoc = cap)
        .as[(Long, Long, Long, Long, String)].collect().toSeq
        .sortBy(_._2)
    val full = capped(Int.MaxValue)
    assert(full.length == 49) // starts 0,2,...,96 (grid end n_tok-2-1=97)
    val cut = capped(5)
    assert(cut.length == 5)
    assert(cut == full.take(5)) // prefix of the uncapped output
    // every kept window is still a FULL window (the fuse cuts the doc
    // tail, it never emits a malformed chunk)
    assert(cut.forall(_._4 == 4L))
    // cap=1 degenerates to one leading window per doc
    assert(capped(1) == full.take(1))
  }

  test("property: capped output is always a prefix of uncapped, and the " +
      "tail window is never fully contained in its predecessor") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 25) {
      val nTok = 1 + rnd.nextInt(40)
      val size = 1 + rnd.nextInt(8)
      val overlap = rnd.nextInt(size)
      val cap = 1 + rnd.nextInt(6)
      val text = (1 to nTok).map(i => s"w$i").mkString(" ")
      val docs = Seq(1L -> text).toDF("doc_id", "text")
      def go(c: Int) =
        TextAnalysis.chunks(docs, col("doc_id"), col("text"), size, overlap,
            maxChunksPerDoc = c)
          .as[(Long, Long, Long, Long, String)].collect().toSeq
          .sortBy(_._2)
      val full = go(Int.MaxValue)
      val cut = go(cap)
      assert(cut == full.take(cap),
        s"n=$nTok size=$size ov=$overlap cap=$cap: not a prefix")
      // tail-window invariant (uncapped): the last window starts at or
      // before n_tok-1 and past n_tok-size only when it's the only cover
      val last = full.last
      if (full.length > 1) {
        val prev = full(full.length - 2)
        assert(last._3 + last._4 > prev._3 + prev._4,
          s"n=$nTok size=$size ov=$overlap: tail window adds no coverage")
      }
      // full coverage when uncapped
      val covered = full.flatMap(c => c._3 until (c._3 + c._4)).toSet
      assert(covered == (0L until nTok.toLong).toSet)
    }
  }

  test("chunking requires 0 <= overlap < chunkSize") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.chunks(docs, col("doc_id"), col("text"), 4, 4)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.chunks(docs, col("doc_id"), col("text"), 0, 0)
    }
  }
}
