package graft.connect

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.OdsImport

/** SURVEY §5 item 4, wire leg: the ODS pipeline's sink sequences asserted
  * at the HTTP level against an in-process FHIR stub — exact POST/PUT/
  * DELETE method+path+body sequences (dags/ODSImport.py:246-256 POST and
  * harvest Location id; :292-304 conditional PUT; :646-659 DELETE), plus
  * the X9 retry/fail-fast contract of [[HttpFhirStore]].
  */
class HttpFhirStoreSpec extends SparkSpec {
  import spark.implicits._

  private def withServer(f: StubFhirServer => Unit): Unit = {
    val srv = new StubFhirServer
    try f(srv) finally srv.stop()
  }

  test("create POSTs and harvests the Location-header id") {
    withServer { srv =>
      val store = HttpStoreRef(srv.baseUrl).store
      val id = store.create("Organization", """{"name":"THE SURGERY"}""")
      assert(id == "1")
      assert(srv.log == Seq(
        srv.Req("POST", "Organization", """{"name":"THE SURGERY"}""")))
      assert(store.read("Organization", id).contains("""{"name":"THE SURGERY"}"""))
    }
  }

  test("ODS organisation leg over the wire: exact POST/PUT/DELETE sequences") {
    withServer { srv =>
      val ref = HttpStoreRef(srv.baseUrl)
      val epraccur = Seq(
        ("B86030", "THE SURGERY", "Y56", "N1 1AA", "0207", ""),
        ("C55555", "OTHER SURGERY", "", "E2 2BB", "", ""))
        .toDF("ODS", "Organisation_Name", "NationalGrouping", "PostCode",
          "PhoneNumber", "Closed")
        .withColumn("AddressLine_1", lit("1 HIGH ST"))
        .withColumn("AddressLine_2", lit(""))
        .withColumn("AddressLine_3", lit(""))
        .withColumn("AddressLine_4", lit(""))

      // insert leg: every row POSTs its document and the server-assigned
      // ids come back keyed by ODS code
      val empty = Seq.empty[(String, String, String, String)]
        .toDF("_id", "Key", "Identifier", "ResourceString")
      val plan = OdsImport.planOrganisations(
        OdsImport.mergeOrganisations(epraccur, empty))
      val docs = plan.filter(col("action") === "insert")
        .select(col("ODS"), col("doc")).as[(String, String)]
        .collect().toMap
      val inserted = FhirSinks.createReturningIds(
        plan.filter(col("action") === "insert"), "ODS", "doc",
        "Organization", ref)
        .as[(String, String)].collect().toMap
      assert(inserted.keySet == Set("B86030", "C55555"))
      assert(inserted.values.toSet == Set("1", "2"))
      val posts = srv.log
      assert(posts.map(_.method).toSet == Set("POST"))
      assert(posts.map(_.path).toSet == Set("Organization"))
      // each POST carried exactly the planned document (partition order is
      // nondeterministic, so compare as a set)
      assert(posts.map(_.body).toSet == docs.values.toSet)

      // update leg: exactly one PUT to the assigned id with the new doc
      srv.clearLog()
      val newDoc = """{"resourceType":"Organization","name":"RENAMED"}"""
      val updates = Seq((inserted("C55555"), newDoc)).toDF("_target_id", "doc")
      assert(FhirSinks.updateWhere(updates, "_target_id", "doc",
        "Organization", ref) == 1)
      assert(srv.log == Seq(
        srv.Req("PUT", s"Organization/${inserted("C55555")}", newDoc)))
      assert(srv.contents(s"Organization/${inserted("C55555")}") == newDoc)

      // delete leg (U4/S8): one DELETE per id, store emptied
      srv.clearLog()
      val doomed = inserted.values.toSeq.toDF("_id")
      assert(FhirSinks.deleteAll(doomed, "_id", "Organization", ref) == 2)
      assert(srv.log.map(r => (r.method, r.path)).toSet ==
        inserted.values.map(id => ("DELETE", s"Organization/$id")).toSet)
      assert(srv.contents.isEmpty)
    }
  }

  test("search pushes parameters as the query string and unpacks the Bundle") {
    withServer { srv =>
      srv.put("Task/7", """{"resourceType":"Task","status":"requested"}""")
      srv.put("Task/8", """{"resourceType":"Task","status":"accepted"}""")
      val store = HttpStoreRef(srv.baseUrl).store
      val hits = store.search("Task", "status" -> "requested")
      assert(hits == Seq("""{"resourceType":"Task","status":"requested"}"""))
      assert(srv.log.last.path == "Task?status=requested")
      // no params → whole type, sorted
      assert(store.search("Task").length == 2)
    }
  }

  test("transient 5xx retries up to the bound; success on a later attempt") {
    withServer { srv =>
      srv.failNext(2, code = 503)
      val store = HttpStoreRef(srv.baseUrl, retries = 3).store
      val id = store.create("Organization", """{"name":"X"}""")
      assert(id == "1")
      // all three attempts hit the wire: 503, 503, 201
      assert(srv.log.count(r => r.method == "POST") == 3)
    }
  }

  test("retries exhausted on persistent 5xx surfaces the failure") {
    withServer { srv =>
      srv.failNext(10, code = 500)
      val store = HttpStoreRef(srv.baseUrl, retries = 2).store
      intercept[java.io.IOException] {
        store.create("Organization", """{"name":"X"}""")
      }
      assert(srv.log.length == 3) // initial + 2 retries, then fail loud
    }
  }

  test("4xx fails fast: a rejected document is not retried") {
    withServer { srv =>
      srv.failNext(1, code = 422)
      val store = HttpStoreRef(srv.baseUrl, retries = 3).store
      intercept[IllegalArgumentException] {
        store.create("Organization", """{"bad":true}""")
      }
      assert(srv.log.length == 1)
    }
  }

  test("read returns None on 404 without throwing") {
    withServer { srv =>
      val store = HttpStoreRef(srv.baseUrl).store
      assert(store.read("Organization", "999").isEmpty)
    }
  }
}
