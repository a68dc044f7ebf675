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

  test("r12 hostile shapes: no item field, empty answers, 4-deep verbatim") {
    // QR with NO item field: questionnaire + item are APPENDED (they did
    // not exist), comments section present but empty.
    val noItem = convert(
      """{"resourceType":"QuestionnaireResponse","id":"x","status":"done"}""")
    assert(noItem.get("item").size() == 1)
    assert(noItem.get("item").get(0).get("item").size() == 0)
    // empty answer array still emits a zero-answer Q/A pair
    val ea = convert(
      """{"resourceType":"QuestionnaireResponse","item":[{"linkId":"e","text":"t","answer":[]}]}""")
    val pair = ea.get("item").get(0).get("item").get(0)
    assert(pair.get("item").get(1).get("answer").size() == 0)
    // a qualifying sub-sub with its OWN 4th level is copied verbatim —
    // the walk is bounded at 3 levels (SURVEY data-model note)
    val deep = convert(
      """{"resourceType":"QuestionnaireResponse","item":[{"linkId":"g","item":[{"linkId":"w","item":[{"linkId":"problemStatus","answer":[{"valueString":"a"}],"item":[{"linkId":"level4","answer":[{"valueString":"deep"}]}]}]}]}]}""")
    val kept = deep.get("item").get(1).get("item").get(0).get("item").get(0)
    assert(kept.get("item").get(0).get("linkId").asText() == "level4")
  }

  test("r12 hostile strings round-trip with canonical escapes") {
    val in =
      """{"resourceType":"QuestionnaireResponse","item":[{"linkId":"h","text":"Q\"uo\\te\n中","answer":[{"valueString":"A\tB"}]}]}"""
    val out = QuestionnaireRestructure.convertQrJson(in)
    assert(out.contains("""Q\"uo\\te\n中"""))
    assert(out.contains("""A\tB"""))
  }

  test("r12 bundle edges: 0-entry no-op, resource-less entry preserved") {
    val empty = """{"resourceType":"Bundle","type":"collection","entry":[]}"""
    assert(QuestionnaireRestructure.convertBundleJson(empty) == empty)
    val noRes =
      """{"resourceType":"Bundle","entry":[{"fullUrl":"urn:uuid:x"},{"resource":{"resourceType":"QuestionnaireResponse","item":[]}}]}"""
    val out = m.readTree(QuestionnaireRestructure.convertBundleJson(noRes))
    assert(out.get("entry").get(0).get("fullUrl").asText() == "urn:uuid:x")
    assert(out.get("entry").get(1).get("resource").get("questionnaire")
      .asText() == QuestionnaireRestructure.QuestionnaireUrl)
  }

  test("malformed JSON yields null from the column expression, not a crash") {
    import spark.implicits._
    val got = Seq("{not json", """{"resourceType":"Bundle","entry":[]}""")
      .toDF("j")
      .select(QuestionnaireRestructure.restructureQr(col("j"))).as[String]
      .collect()
    assert(got(0) == null)
    assert(got(1) != null)
  }

  test("column expression form works in a plan") {
    import spark.implicits._
    val qr = """{"resourceType":"QuestionnaireResponse","item":[{"linkId":"q","answer":[{"valueString":"a"}]}]}"""
    val got = Seq(qr).toDF("j")
      .select(QuestionnaireRestructure.restructureQr(col("j"))).as[String].head()
    assert(got.contains("LOINC/61149-1"))
  }
}
