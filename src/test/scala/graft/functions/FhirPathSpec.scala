package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Locks the restricted-FHIRPath semantics to the reference's observed path
  * shapes (RaceAndEthnicCategorySQL.ipynb:455,643-648;
  * DeleteDuplicatesinIRISFHIRServer.ipynb:38) — US-Core race complex
  * extension, birthsex valueCode, identifier[0].value.
  */
class FhirPathSpec extends SparkSpec {
  import spark.implicits._

  private val patient =
    """{
      "resourceType": "Patient",
      "identifier": [
        {"system": "https://emis.com/Id/Patient/DBID", "value": "d-42"},
        {"system": "https://nhs.uk/Id/nhs-number", "value": "943-476"}],
      "extension": [
        {"url": "http://hl7.org/fhir/us/core/StructureDefinition/us-core-race",
         "extension": [
           {"url": "ombCategory",
            "valueCoding": {"code": "2106-3", "display": "White"}},
           {"url": "text", "valueString": "White"}]},
        {"url": "http://hl7.org/fhir/us/core/StructureDefinition/us-core-birthsex",
         "valueCode": "F"}],
      "name": [{"family": "KOYA", "given": ["M", "R"]}]
    }"""

  private def one(path: String): String =
    Seq(patient).toDF("j")
      .select(compat.getFhirPathOne(col("j"), path)).as[String].head()

  test("complex extension chain: race ombCategory code/display") {
    val base = "extension('http://hl7.org/fhir/us/core/StructureDefinition/us-core-race')"
    assert(one(s"$base.extension('ombCategory').valueCoding.code") == "2106-3")
    assert(one(s"$base.extension('ombCategory').valueCoding.display") == "White")
    assert(one(s"$base.extension('text').valueString") == "White")
  }

  test("simple extension valueCode (birthsex)") {
    assert(one(
      "extension('http://hl7.org/fhir/us/core/StructureDefinition/us-core-birthsex').valueCode")
      == "F")
  }

  test("indexed member access") {
    assert(one("identifier[0].value") == "d-42")
    assert(one("identifier[1].system") == "https://nhs.uk/Id/nhs-number")
    assert(one("name[0].family") == "KOYA")
  }

  test("member access flat-maps arrays; GetFHIRPath returns JSON array") {
    val all = Seq(patient).toDF("j")
      .select(compat.getFhirPath(col("j"), "identifier.value")).as[String].head()
    assert(all == """["d-42","943-476"]""")
  }

  test("missing path and out-of-range index return null") {
    val df = Seq(patient).toDF("j")
    val got = df.select(
      compat.getFhirPathOne(col("j"), "nope.nothing"),
      compat.getFhirPathOne(col("j"), "identifier[9].value"),
      compat.getFhirPathOne(col("j"), "extension('https://absent').valueCode"))
      .as[(Option[String], Option[String], Option[String])].head()
    assert(got == ((None, None, None)))
  }

  test("malformed JSON returns null; unsupported segment throws loudly") {
    val bad = Seq("not json").toDF("j")
      .select(compat.getFhirPathOne(col("j"), "a.b")).as[Option[String]].head()
    assert(bad.isEmpty)
    val ex = intercept[Exception] {
      Seq(patient).toDF("j")
        .select(compat.getFhirPathOne(col("j"), "where(use='official')")).head()
    }
    assert(ex.getMessage.contains("unsupported path segment") ||
      ex.getCause != null)
  }

  test("parse memo never serves a stale tree: alternating documents and " +
      "multi-path extraction over distinct rows stay row-correct") {
    // two paths per row (memo hit within row) over docs that alternate
    // content (memo miss across rows) — a stale memo would smear row n's
    // values into row n+1
    val docs = (1 to 50).map(i => s"""{"id":"$i","v":{"x":"x$i"}}""")
    val got = docs.toDF("j")
      .select(compat.getFhirPathOne(col("j"), "id").as("id"),
        compat.getFhirPathOne(col("j"), "v.x").as("x"))
      .as[(String, String)].collect().toSeq
    assert(got == (1 to 50).map(i => (s"$i", s"x$i")))
  }

  test("non-string results render as compact JSON") {
    val j = """{"a":{"b":[1,2]},"n":3}"""
    val got = Seq(j).toDF("j")
      .select(compat.getFhirPathOne(col("j"), "a")).as[String].head()
    assert(got == """{"b":[1,2]}""")
  }
}
