package graft.etl

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.compat

/** T1–T4/T7 — row→FHIR document construction as columnar `to_json(struct)`
  * plans (conditional fields become null branches that `to_json` omits),
  * mirroring the reference's builders field-for-field and key-order-for-
  * key-order:
  *
  *  - [[organization]]      dags/ODSImport.py:160-230
  *  - [[practitioner]]      dags/ODSImport.py:388-431
  *  - [[practitionerRole]]  dags/ODSImport.py:526-583
  *  - [[bundleToMessageA04]] dags/ConsultationNoteWritebackX.py:546-601
  *  - [[appendNote]]        dags/ConsultationNoteWritebackX.py:136-156
  *
  * All but the A04 message builder are pure built-in expressions (codegen'd,
  * million-rows/sec per core); the message builder restructures a
  * heterogeneous Bundle and uses a Jackson CodegenFallback expression.
  */
object FhirBuilders {

  private def nonEmpty(c: Column): Column = c.isNotNull && c =!= ""
  private def opt(cond: Column, v: Column): Column =
    when(cond, v) // otherwise null -> dropped by to_json

  /** T1: GP-practice Organization. Replicates reference quirks: address is
    * emitted only when PostCode is set; address.line exists only when
    * AddressLine_1 is set (line 2 appended when present); a Closed marker
    * only flips `active` — the row is still loaded.
    */
  def organization(
      ods: Column, name: Column, postCode: Column, nationalGrouping: Column,
      phone: Column, addr1: Column, addr2: Column, addr3: Column,
      addr4: Column, closed: Column, id: Column): Column = {
    val line = opt(nonEmpty(addr1),
      array_compact(array(addr1, opt(nonEmpty(addr2), addr2))))
    val address = opt(nonEmpty(postCode), array(struct(
      postCode.as("postalCode"),
      line.as("line"),
      opt(nonEmpty(addr3), addr3).as("city"),
      opt(nonEmpty(addr4), addr4).as("district"))))
    to_json(struct(
      lit("Organization").as("resourceType"),
      array(struct(
        lit("https://fhir.nhs.uk/Id/ods-organization-code").as("system"),
        ods.as("value"))).as("identifier"),
      (!nonEmpty(closed)).as("active"),
      array(struct(array(struct(
        lit("https://fhir.nhs.uk/CodeSystem/organisation-role").as("system"),
        lit("76").as("code"),
        lit("GP PRACTICE").as("display"))).as("coding"))).as("type"),
      name.as("name"),
      opt(nonEmpty(nationalGrouping), struct(struct(
        lit("https://fhir.nhs.uk/Id/ods-organization-code").as("system"),
        nationalGrouping.as("value")).as("identifier"))).as("partOf"),
      opt(nonEmpty(phone), array(struct(
        lit("phone").as("system"),
        trim(phone).as("value"),
        lit("work").as("use")))).as("telecom"),
      address.as("address"),
      opt(nonEmpty(id), id).as("id")))
  }

  /** T2: Practitioner from the egpcur GP row ("SURNAME I N" names split via
    * the given() helper; Status other than 'C' deactivates).
    */
  def practitioner(
      gmp: Column, surname: Column, initials: Column, status: Column,
      id: Column): Column =
    to_json(struct(
      lit("Practitioner").as("resourceType"),
      array(struct(
        lit("https://fhir.hl7.org.uk/Id/gmp-number").as("system"),
        gmp.as("value"))).as("identifier"),
      (status.isNull || status === "C").as("active"),
      array(struct(
        surname.as("family"),
        array(lit("Dr")).as("prefix"),
        opt(nonEmpty(initials), split(initials, " ", -1)).as("given")))
        .as("name"),
      array(struct(struct(array(struct(
        lit("http://terminology.hl7.org/CodeSystem/v2-0360").as("system"),
        lit("MD").as("code"),
        lit("Medical Doctor").as("display"))).as("coding")).as("code")))
        .as("qualification"),
      opt(nonEmpty(id), id).as("id")))

  /** T3: PractitionerRole linking both join sides (`_id_x` practitioner,
    * `_id_y` organization), YYYYMMDD period bounds, Ended ⇒ inactive.
    */
  def practitionerRole(
      gmp: Column, practitionerName: Column, ods: Column, orgName: Column,
      idPractitioner: Column, idOrganization: Column,
      started: Column, ended: Column, id: Column): Column =
    to_json(struct(
      lit("PractitionerRole").as("resourceType"),
      (!nonEmpty(ended)).as("active"),
      struct(
        struct(
          lit("https://fhir.hl7.org.uk/Id/gmp-number").as("system"),
          gmp.as("value")).as("identifier"),
        practitionerName.as("display"),
        opt(nonEmpty(idPractitioner),
          concat(lit("Practitioner/"), idPractitioner)).as("reference"))
        .as("practitioner"),
      struct(
        struct(
          lit("https://fhir.nhs.uk/Id/ods-organization-code").as("system"),
          ods.as("value")).as("identifier"),
        orgName.as("display"),
        opt(nonEmpty(idOrganization),
          concat(lit("Organization/"), idOrganization)).as("reference"))
        .as("organization"),
      array(struct(array(struct(
        lit("http://snomed.info/sct").as("system"),
        lit("62247001").as("code"),
        lit("General practitioner").as("display"))).as("coding"))).as("code"),
      array(struct(array(struct(
        lit("http://snomed.info/sct").as("system"),
        lit("394814009").as("code"),
        lit("General practice (specialty) (qualifier value)").as("display")))
        .as("coding"))).as("specialty"),
      struct(
        opt(nonEmpty(started), compat.yyyymmddToIso(started)).as("start"),
        opt(nonEmpty(ended), compat.yyyymmddToIso(ended)).as("end"))
        .as("period"),
      opt(nonEmpty(id), id).as("id")))

  /** T11: the `$send-EMISOpen` request envelope — wrap a transformed
    * payload in `Parameters{parameter:[{name:"EMISOpen",valueString}]}`
    * (ConsultationNoteWritebackX.py:491-497). The send-success check is the
    * information-severity OperationOutcome triage in
    * [[Validation.emisSendSucceeded]].
    */
  def emisOpenEnvelope(payload: Column): Column =
    to_json(struct(
      lit("Parameters").as("resourceType"),
      array(struct(
        lit("EMISOpen").as("name"),
        payload.as("valueString"))).as("parameter")))

  /** T7: append a {time, text} note to a Task's note[] (null-safe). */
  def appendNote(note: Column, time: Column, text: Column): Column =
    concat(
      coalesce(note, array().cast("array<struct<time:string,text:string>>")),
      array(struct(time.as("time"), text.as("text"))))

  /** T4: Bundle → HL7 FHIR Message (ADT A04). The uuid is an argument
    * column (the reference draws uuid4 — pin it for tests/oracle runs;
    * pass `uuid()` for production parity).
    */
  def bundleToMessageA04(bundleJson: Column, uuidCol: Column,
      endpoint: String = MessageA04.DefaultEndpoint,
      odsCode: String = MessageA04.DefaultOds): Column =
    ExprBridge.column(MessageA04Expr(
      ExprBridge.expr(bundleJson), ExprBridge.expr(uuidCol),
      endpoint, odsCode))
}

/** T4 internals: prepend a MessageHeader whose focus lists every Encounter
  * entry's fullUrl, set type=message and a urn:uuid identifier
  * (ConsultationNoteWritebackX.py:546-601).
  */
object MessageA04 {
  val DefaultEndpoint = "http://ec2-18-130-139-120.eu-west-2.compute.amazonaws.com/emis"
  val DefaultOds = "F83004"

  private val mapper = new ObjectMapper()

  def convert(bundleJson: String, uuid: String, endpoint: String,
      odsCode: String): String = {
    val root = mapper.readTree(bundleJson) match {
      case o: ObjectNode => o
      case _ => return bundleJson
    }
    root.put("type", "message")
    val ident = root.putObject("identifier")
    ident.put("system", "urn:ietf:rfc:3986")
    ident.put("value", s"urn:uuid:$uuid")

    val header = mapper.createObjectNode()
    header.put("resourceType", "MessageHeader")
    val ev = header.putObject("eventCoding")
    ev.put("system", "http://terminology.hl7.org/CodeSystem/v2-0003")
    ev.put("code", "A04")
    val dest = header.putArray("destination").addObject()
    dest.put("endpoint", endpoint)
    dest.putObject("receiver").putObject("identifier")
      .put("system", "https://fhir.nhs.uk/Id/ods-organization-code")
      .put("value", odsCode)
    header.putObject("sender").putObject("identifier")
      .put("system", "https://fhir.nhs.uk/Id/ods-organization-code")
      .put("value", odsCode)
    header.putObject("source").put("endpoint", endpoint)
    val focus = header.putArray("focus")
    root.path("entry").forEach { entry =>
      val r = entry.path("resource")
      if (r.path("resourceType").asText() == "Encounter") {
        focus.addObject()
          .put("reference", entry.path("fullUrl").asText())
          .put("type", "Encounter")
      }
    }
    val entries = root.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("entry")
    val headerEntry = mapper.createObjectNode()
    headerEntry.put("fullUrl", s"urn:uuid:$uuid")
    headerEntry.set[ObjectNode]("resource", header)
    entries.insert(0, headerEntry)
    root.toString
  }
}

case class MessageA04Expr(left: Expression, right: Expression,
    endpoint: String, odsCode: String)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "bundle_to_message_a04"

  override protected def nullSafeEval(bundle: Any, uuid: Any): Any =
    try UTF8String.fromString(
      MessageA04.convert(bundle.toString, uuid.toString, endpoint, odsCode))
    catch { case _: Exception => null }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
