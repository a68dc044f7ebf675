package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FhirBuildersSpec extends SparkSpec {
  import spark.implicits._

  private def orgRow(
      postCode: String = "N1 1AA", ng: String = "Y56", phone: String = " 0207 ",
      closed: String = "", id: String = "") =
    Seq(("B86030", "THE SURGERY", postCode, ng, phone, "1 HIGH ST", "SOHO",
      "LONDON", "GTR LONDON", closed, id))
      .toDF("ods", "name", "pc", "ng", "phone", "a1", "a2", "a3", "a4",
        "closed", "id")

  private def buildOrg(df: org.apache.spark.sql.DataFrame): String =
    df.select(FhirBuilders.organization(col("ods"), col("name"), col("pc"),
      col("ng"), col("phone"), col("a1"), col("a2"), col("a3"), col("a4"),
      col("closed"), col("id"))).as[String].head()

  test("T1 organization: full row") {
    val j = buildOrg(orgRow())
    assert(j.contains(""""resourceType":"Organization""""))
    assert(j.contains(""""system":"https://fhir.nhs.uk/Id/ods-organization-code","value":"B86030""""))
    assert(j.contains(""""active":true"""))
    assert(j.contains(""""code":"76","display":"GP PRACTICE""""))
    assert(j.contains(""""partOf":{"identifier":"""))
    assert(j.contains(""""value":"0207","use":"work"""")) // phone trimmed
    assert(j.contains(""""postalCode":"N1 1AA""""))
    assert(j.contains(""""line":["1 HIGH ST","SOHO"]"""))
    assert(j.contains(""""city":"LONDON""""))
    assert(j.contains(""""district":"GTR LONDON""""))
    assert(!j.contains(""""id":""")) // no id on insert rows
  }

  test("T1 organization: conditionals omitted; closed deactivates") {
    val j = buildOrg(orgRow(postCode = "", ng = "", phone = "",
      closed = "20230101", id = "42"))
    assert(!j.contains("address"))
    assert(!j.contains("partOf"))
    assert(!j.contains("telecom"))
    assert(j.contains(""""active":false"""))
    assert(j.contains(""""id":"42""""))
  }

  test("T1 validates clean") {
    val errs = orgRow().select(Validation.validateOrganization(
      FhirBuilders.organization(col("ods"), col("name"), col("pc"),
        col("ng"), col("phone"), col("a1"), col("a2"), col("a3"), col("a4"),
        col("closed"), col("id")))).as[Seq[String]].head()
    assert(errs.isEmpty)
  }

  test("T2 practitioner: given from initials, status flips active") {
    val df = Seq(("G1234567", "KOYA", "M R", "C", ""),
      ("G7654321", "SOLO", "", "L", "9"))
      .toDF("gmp", "surname", "initials", "status", "id")
    val built = df.select(FhirBuilders.practitioner(col("gmp"),
      col("surname"), col("initials"), col("status"), col("id")))
      .as[String].collect()
    assert(built(0).contains(""""family":"KOYA","prefix":["Dr"],"given":["M","R"]"""))
    assert(built(0).contains(""""active":true"""))
    assert(built(1).contains(""""active":false"""))
    assert(!built(1).contains("given"))
    assert(built(1).contains(""""id":"9""""))
    assert(built(0).contains(""""code":"MD","display":"Medical Doctor""""))
  }

  test("T3 practitionerRole: references, period, ended deactivates") {
    val df = Seq(("G1", "KOYA M R", "B86030", "THE SURGERY", "p9", "o7",
      "20200101", "20240630", ""))
      .toDF("gmp", "pname", "ods", "oname", "idx", "idy", "started",
        "ended", "id")
    val j = df.select(FhirBuilders.practitionerRole(col("gmp"), col("pname"),
      col("ods"), col("oname"), col("idx"), col("idy"), col("started"),
      col("ended"), col("id"))).as[String].head()
    assert(j.contains(""""reference":"Practitioner/p9""""))
    assert(j.contains(""""reference":"Organization/o7""""))
    assert(j.contains(""""start":"2020-01-01""""))
    assert(j.contains(""""end":"2024-06-30""""))
    assert(j.contains(""""active":false"""))
    assert(j.contains(""""code":"62247001""""))
  }

  test("T4 bundle→message A04: header prepended, Encounter focus collected") {
    val bundle = """{
      "resourceType": "Bundle",
      "entry": [
        {"fullUrl": "urn:a", "resource": {"resourceType": "Patient"}},
        {"fullUrl": "urn:b", "resource": {"resourceType": "Encounter"}},
        {"fullUrl": "urn:c", "resource": {"resourceType": "Encounter"}}
      ]}"""
    val j = Seq(bundle).toDF("b")
      .select(FhirBuilders.bundleToMessageA04(col("b"), lit("fixed-uuid")))
      .as[String].head()
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(j)
    assert(m.get("type").asText() == "message")
    assert(m.get("identifier").get("value").asText() == "urn:uuid:fixed-uuid")
    val header = m.get("entry").get(0).get("resource")
    assert(header.get("resourceType").asText() == "MessageHeader")
    assert(header.get("eventCoding").get("code").asText() == "A04")
    val focus = header.get("focus")
    assert(focus.size() == 2)
    assert(focus.get(0).get("reference").asText() == "urn:b")
    assert(m.get("entry").size() == 4)
  }

  test("T4 r12 edges: empty entry[] and missing entry field") {
    // empty entry[]: header becomes the SOLE entry, focus empty
    val j1 = MessageA04.convert(
      """{"resourceType":"Bundle","type":"transaction","entry":[]}""",
      "u1", MessageA04.DefaultEndpoint, MessageA04.DefaultOds)
    val m1 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(j1)
    assert(m1.get("entry").size() == 1)
    assert(m1.get("entry").get(0).get("resource").get("focus").size() == 0)
    // no entry field at all: identifier is appended BEFORE the created
    // entry array (field-order contract pinned by q140's key-19 arm)
    val j2 = MessageA04.convert(
      """{"resourceType":"Bundle","type":"transaction"}""",
      "u2", MessageA04.DefaultEndpoint, MessageA04.DefaultOds)
    assert(j2.indexOf("\"identifier\"") < j2.indexOf("\"entry\""))
    val m2 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(j2)
    assert(m2.get("entry").size() == 1)
  }

  test("T7 appendNote null-safe append") {
    val df = Seq((Seq(("t0", "first")), "t1", "second"))
      .toDF("note", "time", "text")
      .select(col("time"), col("text"),
        col("note").cast("array<struct<time:string,text:string>>").as("note"))
    val out = df.select(FhirBuilders.appendNote(col("note"), col("time"),
      col("text"))).as[Seq[(String, String)]].head()
    assert(out == Seq(("t0", "first"), ("t1", "second")))
  }

  test("T10 OperationOutcome triage honors the ignored SNOMED code") {
    val fail = """{"issue":[{"severity":"error","details":{"text":"bad"}}]}"""
    val ignored = """{"issue":[{"severity":"error","details":{"text":"code 307321000000107 missing"}}]}"""
    val warn = """{"issue":[{"severity":"warning","details":{"text":"meh"}}]}"""
    val got = Seq(fail, ignored, warn).toDF("o")
      .select(Validation.operationOutcomeFails(col("o"))).as[Boolean].collect()
    assert(got.toSeq == Seq(true, false, false))
  }
}
