package graft.etl

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** T5 shape cases per ConsultationNoteWritebackX.py:336-399: answer-only
  * items, missing text, problem sub-items, missing linkId → problemCode,
  * no qualifying sub-item → dropped problem, idempotence.
  */
class QuestionnaireRestructureSpec extends SparkSpec {
  private val m = new ObjectMapper()

  private def convert(json: String) =
    m.readTree(QuestionnaireRestructure.convertQrJson(json))

  test("flat Q/A items become question/answer pairs under LOINC/61149-1") {
    val qr = """{
      "resourceType": "QuestionnaireResponse", "status": "completed",
      "item": [
        {"linkId": "q1", "text": "How are you?",
         "answer": [{"valueString": "fine"}, {"valueString": "ish"}]},
        {"linkId": "q2", "answer": [{"valueBoolean": true}]}
      ]}"""
    val out = convert(qr)
    assert(out.get("questionnaire").asText() ==
      QuestionnaireRestructure.QuestionnaireUrl)
    assert(out.get("status").asText() == "completed") // other fields kept
    val items = out.get("item")
    assert(items.size() == 1) // no problems section
    val comments = items.get(0)
    assert(comments.get("linkId").asText() == "LOINC/61149-1")
    val qa = comments.get("item")
    assert(qa.size() == 2)
    // question text falls back to linkId when text missing
    assert(qa.get(0).get("item").get(0).get("answer").get(0)
      .get("valueString").asText() == "How are you?")
    assert(qa.get(1).get("item").get(0).get("answer").get(0)
      .get("valueString").asText() == "q2")
    // answers carried verbatim, in order
    assert(qa.get(0).get("item").get(1).get("answer").size() == 2)
  }

  test("problem groups: qualifying sub-items kept, no-linkId becomes problemCode") {
    val qr = """{
      "resourceType": "QuestionnaireResponse",
      "item": [
        {"linkId": "grp", "item": [
          {"answer": [{"valueCoding": {"code": "195967001"}}]},
          {"linkId": "wrapper", "item": [
            {"linkId": "problemStatus", "answer": [{"valueString": "active"}]},
            {"linkId": "problemType", "answer": [{"valueString": "chronic"}]},
            {"linkId": "irrelevant", "answer": [{"valueString": "x"}]}
          ]}
        ]}
      ]}"""
    val out = convert(qr)
    val items = out.get("item")
    assert(items.size() == 2)
    val problems = items.get(1)
    assert(problems.get("linkId").asText() == "LOINC/11450-4")
    val problem = problems.get("item").get(0)
    val sub = problem.get("item")
    assert(sub.size() == 3) // problemCode + problemStatus + problemType
    assert(sub.get(0).get("linkId").asText() == "problemCode")
    assert(sub.get(1).get("linkId").asText() == "problemStatus")
    assert(sub.get(2).get("linkId").asText() == "problemType")
  }

  test("problem group with only non-qualifying sub-items is dropped") {
    val qr = """{
      "resourceType": "QuestionnaireResponse",
      "item": [{"linkId": "grp", "item": [
        {"linkId": "wrapper", "item": [
          {"linkId": "other", "answer": [{"valueString": "x"}]}]}]}]}"""
    val out = convert(qr)
    assert(out.get("item").size() == 1) // comments only, no problem list
  }

  test("idempotence: converting a converted QR keeps one comments section") {
    val qr = """{
      "resourceType": "QuestionnaireResponse",
      "item": [{"linkId": "q", "answer": [{"valueString": "a"}]}]}"""
    val once = QuestionnaireRestructure.convertQrJson(qr)
    val twice = QuestionnaireRestructure.convertQrJson(once)
    val o = m.readTree(twice)
    assert(o.get("item").size() == 1)
    assert(o.get("item").get(0).get("linkId").asText() == "LOINC/61149-1")
  }

  test("T6 bundle rewrite only touches QuestionnaireResponse entries") {
    val bundle = """{
      "resourceType": "Bundle",
      "entry": [
        {"resource": {"resourceType": "Patient", "id": "p1"}},
        {"resource": {"resourceType": "QuestionnaireResponse",
          "item": [{"linkId": "q", "answer": [{"valueString": "a"}]}]}}
      ]}"""
    val out = m.readTree(QuestionnaireRestructure.convertBundleJson(bundle))
    assert(out.get("entry").get(0).get("resource").get("id").asText() == "p1")
    val qr = out.get("entry").get(1).get("resource")
    assert(qr.get("questionnaire").asText() ==
      QuestionnaireRestructure.QuestionnaireUrl)
  }

  test("column expression form works in a plan") {
    import spark.implicits._
    val qr = """{"resourceType":"QuestionnaireResponse","item":[{"linkId":"q","answer":[{"valueString":"a"}]}]}"""
    val got = Seq(qr).toDF("j")
      .select(QuestionnaireRestructure.restructureQr(col("j"))).as[String].head()
    assert(got.contains("LOINC/61149-1"))
  }
}
