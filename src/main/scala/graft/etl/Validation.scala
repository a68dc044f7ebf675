package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** T9/T10 — validation as plan columns.
  *
  * T9 (pydantic-style structural checks, dags/ODSImport.py:229,428,582):
  * required-field predicates over the built JSON producing an
  * `errors: array<string>` column — empty array = valid. Runs inside
  * codegen; a 100 TB load validates during the same scan that builds.
  *
  * T10 ($validate OperationOutcome triage,
  * ConsultationNoteWritebackX.py:434-468): failure = any issue with
  * severity=error whose details don't carry the ignored SNOMED code.
  */
object Validation {

  private def req(json: Column, path: String, msg: String): Column =
    when(get_json_object(json, path).isNull, lit(msg))

  /** Structural checks shared by every FHIR resource we build. */
  def validateResource(json: Column, expectedType: String): Column =
    array_compact(array(
      when(get_json_object(json, "$.resourceType").isNull ||
        get_json_object(json, "$.resourceType") =!= expectedType,
        lit(s"resourceType must be $expectedType")),
      req(json, "$.identifier[0].system", "identifier[0].system required"),
      req(json, "$.identifier[0].value", "identifier[0].value required")))

  def validateOrganization(json: Column): Column =
    array_union(validateResource(json, "Organization"),
      array_compact(array(
        req(json, "$.name", "name required"),
        req(json, "$.type[0].coding[0].code", "type coding required"))))

  def validatePractitioner(json: Column): Column =
    array_union(validateResource(json, "Practitioner"),
      array_compact(array(
        req(json, "$.name[0].family", "name[0].family required"))))

  def validatePractitionerRole(json: Column): Column =
    array_compact(array(
      when(get_json_object(json, "$.resourceType") =!= "PractitionerRole",
        lit("resourceType must be PractitionerRole")),
      req(json, "$.practitioner.identifier.value",
        "practitioner identifier required"),
      req(json, "$.organization.identifier.value",
        "organization identifier required")))

  /** T11 success check: `$send-EMISOpen` succeeded iff the response is an
    * OperationOutcome whose first issue has severity=information
    * (ConsultationNoteWritebackX.py:501-510); the first issue's
    * diagnostics is the failure detail (X10's `Diagnostics` XCom).
    */
  def emisSendSucceeded(outcomeJson: Column): Column =
    get_json_object(outcomeJson, "$.resourceType") === "OperationOutcome" &&
      get_json_object(outcomeJson, "$.issue[0].severity") === "information"

  def emisSendDiagnostics(outcomeJson: Column): Column =
    coalesce(get_json_object(outcomeJson, "$.issue[0].diagnostics"), lit(""))

  /** T10: does an OperationOutcome fail the gate? Error-severity issues are
    * fatal unless the details text carries the ignored SNOMED expression
    * code 307321000000107 (reference line 447).
    */
  def operationOutcomeFails(outcomeJson: Column): Column = {
    val issues = from_json(outcomeJson,
      org.apache.spark.sql.types.DataTypes.createStructType(Array(
        org.apache.spark.sql.types.DataTypes.createStructField("issue",
          org.apache.spark.sql.types.DataTypes.createArrayType(
            org.apache.spark.sql.types.DataTypes.createStructType(Array(
              org.apache.spark.sql.types.DataTypes.createStructField(
                "severity", org.apache.spark.sql.types.DataTypes.StringType, true),
              org.apache.spark.sql.types.DataTypes.createStructField(
                "diagnostics", org.apache.spark.sql.types.DataTypes.StringType, true),
              org.apache.spark.sql.types.DataTypes.createStructField("details",
                org.apache.spark.sql.types.DataTypes.createStructType(Array(
                  org.apache.spark.sql.types.DataTypes.createStructField(
                    "text", org.apache.spark.sql.types.DataTypes.StringType, true))),
                true)))), true)))).getField("issue")
    coalesce(
      exists(issues, i =>
        i.getField("severity") === "error" &&
          !coalesce(i.getField("details").getField("text"), lit(""))
            .contains("307321000000107")),
      lit(false))
  }
}
