package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.connect.{FhirSinks, InMemoryFhirStore, StoreRef}

/** SURVEY §5 item 4 — pipeline e2e: run the ODS organisation leg against
  * the in-process FHIR store fixture, apply the action frame through the
  * sinks, then re-run: the second pass must be all-noop ("data load needs
  * to be repeatable", reference nb OrganisationalDataServices.ipynb:730).
  */
class OdsPipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  private def epraccur = Seq(
    ("B86030", "THE SURGERY", "Y56", "N1 1AA", "0207", ""),
    ("C55555", "OTHER SURGERY", "", "E2 2BB", "", ""))
    .toDF("ODS", "Organisation_Name", "NationalGrouping", "PostCode",
      "PhoneNumber", "Closed")
    .withColumn("AddressLine_1", lit("1 HIGH ST"))
    .withColumn("AddressLine_2", lit(""))
    .withColumn("AddressLine_3", lit(""))
    .withColumn("AddressLine_4", lit(""))

  /** The store's current state projected the way the S2 extract is
    * (P1 projection: _id, Key, Identifier, ResourceString).
    */
  private def storeExtract(ref: StoreRef) = {
    val rows = ref.store.asInstanceOf[InMemoryFhirStore].all.toSeq
      .collect { case (k, json) if k.startsWith("Organization/") =>
        val id = k.stripPrefix("Organization/")
        val ods = com.fasterxml.jackson.databind.json.JsonMapper.builder()
          .build().readTree(json)
          .path("identifier").path(0).path("value").asText()
        (id, k, s"https://fhir.nhs.uk/Id/ods-organization-code|$ods", json)
      }
    rows.toDF("_id", "Key", "Identifier", "ResourceString")
  }

  test("ODS organisation leg: first run inserts, second run is all-noop") {
    val ref = StoreRef("ods-e2e")

    // pass 1: empty store → everything inserts
    val empty = Seq.empty[(String, String, String, String)]
      .toDF("_id", "Key", "Identifier", "ResourceString")
    val plan1 = OdsImport.planOrganisations(
      OdsImport.mergeOrganisations(epraccur, empty))
    assert(plan1.filter(col("action") === "insert").count() == 2)

    val inserted = FhirSinks.createReturningIds(
      plan1.filter(col("action") === "insert"), "ODS", "doc",
      "Organization", ref)
    assert(inserted.count() == 2)
    assert(ref.store.asInstanceOf[InMemoryFhirStore].size == 2)

    // pass 2: same input against the loaded store → all noop (idempotence)
    val plan2 = OdsImport.planOrganisations(
      OdsImport.mergeOrganisations(epraccur, storeExtract(ref)))
    val actions2 = plan2.select("ODS", "action")
      .as[(String, String)].collect().toMap
    assert(actions2.values.forall(_ == "noop"), s"expected noop: $actions2")

    // pass 3: a changed postcode → exactly that row updates, applied via S7
    val changed = epraccur.withColumn("PostCode",
      when(col("ODS") === "C55555", "E9 9ZZ").otherwise(col("PostCode")))
    val plan3 = OdsImport.planOrganisations(
      OdsImport.mergeOrganisations(changed, storeExtract(ref)))
    val updates = plan3.filter(col("action") === "update")
    assert(updates.select("ODS").as[String].collect().toSeq == Seq("C55555"))
    val n = FhirSinks.updateWhere(
      updates.withColumn("_target_id", col("_id")),
      "_target_id", "doc", "Organization", ref)
    assert(n == 1)

    // pass 4: after the update lands, the changed input is noop again
    val plan4 = OdsImport.planOrganisations(
      OdsImport.mergeOrganisations(changed, storeExtract(ref)))
    assert(plan4.filter(col("action") =!= "noop").count() == 0)
  }
}
