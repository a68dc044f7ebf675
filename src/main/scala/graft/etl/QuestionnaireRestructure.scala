package graft.etl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graftbridge.ExprBridge

/** T5/T6 — legacy QuestionnaireResponse restructure
  * (reference: dags/ConsultationNoteWritebackX.py:336-399, identical in the
  * Y and olddag revisions; walkthrough notebook :1500-1579).
  *
  * Semantics (faithful to the reference, re-expressed):
  *  - set `questionnaire` = the ClinicalManagementPlan canonical URL;
  *  - rebuild `item[]` as one "Comments and advice" section
  *    (`LOINC/61149-1`) holding every flat Q/A item re-shaped to
  *    {question: item.text|linkId, answer: item.answer[]} pairs;
  *  - items carrying sub-items are treated as problem groups: sub-items
  *    with linkId ∈ {problemStatus, problemSignificance, problemType,
  *    problemExpectedDuration} are kept, a sub-item *without* a linkId
  *    becomes a `problemCode` entry; if any qualifying sub-item was found
  *    the problem joins a "Problem list" section (`LOINC/11450-4`)
  *    appended after the comments section;
  *  - an item can be both Q/A and problem-group (the reference checks
  *    `answer` and `item` independently);
  *  - every other top-level field of the QR is preserved.
  *
  * Pure JSON→JSON function, exposed as a CodegenFallback expression so it
  * runs inside the row pipeline without a UDF serialization boundary.
  */
object QuestionnaireRestructure {

  val QuestionnaireUrl =
    "https://fhir.virtually.healthcare/Questionnaire/ClinicalManagementPlan"
  private val ProblemLinkIds = Set(
    "problemStatus", "problemSignificance", "problemType",
    "problemExpectedDuration")

  private val mapper = new ObjectMapper()

  /** T5 on a parsed QuestionnaireResponse node (mutates a copy). */
  def convertQr(qr: ObjectNode): ObjectNode = {
    val out = qr.deepCopy()
    out.put("questionnaire", QuestionnaireUrl)

    val comments = mapper.createObjectNode()
    comments.put("linkId", "LOINC/61149-1")
    comments.put("text", "Comments and advice")
    val commentItems = comments.putArray("item")

    val problems = mapper.createObjectNode()
    problems.put("linkId", "LOINC/11450-4")
    problems.put("text", "Problem list")
    val problemItems = problems.putArray("item")
    var problemsFound = false

    val items = qr.get("item") match {
      case a: ArrayNode => a
      case _ => mapper.createArrayNode()
    }
    items.forEach { item =>
      if (item.has("answer")) {
        val question =
          if (item.has("text")) item.get("text").asText()
          else item.path("linkId").asText()
        val newItem = mapper.createObjectNode()
        newItem.put("linkId", "questions")
        val pair = newItem.putArray("item")
        val qNode = mapper.createObjectNode()
        qNode.put("linkId", "question")
        qNode.putArray("answer")
          .add(mapper.createObjectNode().put("valueString", question))
        val aNode = mapper.createObjectNode()
        aNode.put("linkId", "answer")
        val answers = aNode.putArray("answer")
        item.get("answer").forEach(a => answers.add(a.deepCopy[JsonNode]()))
        pair.add(qNode).add(aNode)
        commentItems.add(newItem)
      }
      if (item.has("item")) {
        val problem = mapper.createObjectNode()
        problem.put("linkId", "problem")
        problem.put("text", "Problem")
        val pItems = problem.putArray("item")
        var problemFound = false
        item.get("item").forEach { sub =>
          if (!sub.has("linkId")) {
            val code = mapper.createObjectNode()
            code.put("linkId", "problemCode")
            code.put("text", "Problem Code")
            code.set[ObjectNode]("answer", sub.path("answer").deepCopy[JsonNode]())
            pItems.add(code)
          }
          if (sub.has("item")) {
            sub.get("item").forEach { subsub =>
              if (subsub.has("linkId") &&
                ProblemLinkIds.contains(subsub.get("linkId").asText())) {
                pItems.add(subsub.deepCopy[JsonNode]())
                problemFound = true
              }
            }
          }
        }
        if (problemFound) {
          problemItems.add(problem)
          problemsFound = true
        }
      }
    }

    val newItems = out.putArray("item")
    newItems.add(comments)
    if (problemsFound) newItems.add(problems)
    out
  }

  /** T5 on a JSON string. */
  def convertQrJson(json: String): String =
    mapper.readTree(json) match {
      case o: ObjectNode => convertQr(o).toString
      case _ => json
    }

  /** T6 — per-resource-type Bundle rewrite: convert every entry whose
    * resource is a QuestionnaireResponse (ConsultationNoteWritebackX.py:282-291).
    */
  def convertBundleJson(json: String): String =
    mapper.readTree(json) match {
      case bundle: ObjectNode =>
        bundle.path("entry").forEach {
          case entry: ObjectNode =>
            entry.get("resource") match {
              case r: ObjectNode
                  if r.path("resourceType").asText() == "QuestionnaireResponse" =>
                entry.set[ObjectNode]("resource", convertQr(r))
              case _ =>
            }
          case _ =>
        }
        bundle.toString
      case _ => json
    }

  /** Column form: restructure a QR JSON string column. */
  def restructureQr(c: Column): Column =
    ExprBridge.column(QrRestructureExpr(ExprBridge.expr(c), bundle = false))

  /** Column form: rewrite every QR entry inside a Bundle JSON string column. */
  def restructureBundle(c: Column): Column =
    ExprBridge.column(QrRestructureExpr(ExprBridge.expr(c), bundle = true))
}

case class QrRestructureExpr(child: Expression, bundle: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (bundle) "qr_restructure_bundle" else "qr_restructure"

  override protected def nullSafeEval(json: Any): Any = {
    val s = json.toString
    val out =
      try {
        if (bundle) QuestionnaireRestructure.convertBundleJson(s)
        else QuestionnaireRestructure.convertQrJson(s)
      } catch { case _: Exception => return null }
    UTF8String.fromString(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
