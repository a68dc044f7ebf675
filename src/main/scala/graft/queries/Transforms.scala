package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.etl.{FhirBuilders, OdsImport, QuestionnaireRestructure}

/** The reference's hardest JSON transforms promoted from spec-only to the
  * driver's hard CORRECTNESS gate (VERDICT r10 #1/#5):
  *
  *  - q139: T5 QuestionnaireResponse restructure
  *    (dags/ConsultationNoteWritebackX.py:336-399)
  *  - q140: T4 Bundle -> HL7 FHIR Message ADT A04
  *    (dags/ConsultationNoteWritebackX.py:546-601)
  *  - q141: T6 per-resource-type Bundle rewrite
  *    (dags/ConsultationNoteWritebackX.py:282-291)
  *  - q142: U3 role field-diff upsert planning incl. the byte-identical
  *    T3 PractitionerRole document (dags/ODSImport.py:526-583,610-646)
  *
  * Oracle pattern (q44's, extended): the INPUT document is assembled
  * per-row from fixture keys, the Spark side runs the real transform, and
  * the DuckDB side replays the documented transform as string assembly on
  * the same keys. Both sides are generated from ONE [[Frag]] token list —
  * the literal fragments cannot drift between the Spark plan and the SQL.
  */
object Transforms {

  /** A string fragment with both engine spellings. Literal fragments are
    * shared verbatim; keyed fragments carry the per-engine expression.
    */
  private final case class Frag(col: Column, sql: String)
  private def lf(s: String): Frag =
    Frag(lit(s), "'" + s.replace("'", "''") + "'")
  private def cat(frags: Frag*): Frag =
    Frag(concat(frags.map(_.col): _*), frags.map(_.sql).mkString(" || "))

  /** CASE over (condition, fragment) arms, first match wins. */
  private def caseOf(arms: Seq[((Column, String), Frag)], dflt: Frag): Frag = {
    val c = arms.tail
      .foldLeft(when(arms.head._1._1, arms.head._2.col)) {
        case (acc, ((cc, _), f)) => acc.when(cc, f.col)
      }
      .otherwise(dflt.col)
    val sql = "CASE " +
      arms.map { case ((_, cs), f) => s"WHEN $cs THEN ${f.sql}" }
        .mkString(" ") + s" ELSE ${dflt.sql} END"
    Frag(c, sql)
  }

  // ---- shared per-row pieces over nation (25 rows, every branch hit) ----
  private def k: Frag =
    Frag(col("n_nationkey").cast("string"), "CAST(n_nationkey AS VARCHAR)")
  private def mod(m: Int, r: Int): (Column, String) =
    (col("n_nationkey") % m === r, s"n_nationkey % $m = $r")
  private def eqk(v: Int): (Column, String) =
    (col("n_nationkey") === v, s"n_nationkey = $v")

  /** The synthetic legacy QR input: four item shapes cycling on the key —
    * flat Q/A (two answers), problem-group (anonymous problemCode sub +
    * two qualifying sub-subs), both-branches item, and a non-qualifying
    * group plus an empty item that neither branch may touch.
    */
  private def qrInput: Frag = {
    val item0 = cat(
      lf("""{"linkId":"q1","text":"Question """), k,
      lf("""","answer":[{"valueString":"A"""), k,
      lf(""""},{"valueInteger":"""), k, lf("}]}"))
    val item1 = cat(
      lf("""{"linkId":"grp","item":[{"answer":[{"valueCoding":{"system":"http://snomed.info/sct","code":"C"""),
      k,
      lf(""""}}]},{"linkId":"wrap","item":[{"linkId":"problemStatus","answer":[{"valueString":"active"}]},{"linkId":"problemSignificance","answer":[{"valueString":"major"}]}]}]}"""))
    val item2 = cat(
      lf("""{"linkId":"both","text":"Both """), k,
      lf("""","answer":[{"valueString":"B"""), k,
      lf(""""}],"item":[{"linkId":"w","item":[{"linkId":"problemType","answer":[{"valueString":"T"""),
      k, lf(""""}]}]}]}"""))
    val item3 = lf(
      """{"linkId":"noq","item":[{"linkId":"sub","item":[{"linkId":"unrelated","answer":[{"valueString":"x"}]}]}]},{"linkId":"empty"}""")
    // r12 hostile shapes (VERDICT r11 #4). Key 23: JSON-special characters
    // in text/answers — canonical escapes (\" \\ \n \t) must survive the
    // Jackson parse->serialize round trip byte-identically, non-ASCII stays
    // raw UTF-8. Key 19: an EMPTY answer array (has("answer") is true, so a
    // Q/A pair with zero answers is still emitted) plus a problem group
    // whose qualifying sub-sub carries a 4th nesting level — the transform
    // walks exactly 3 levels, so level 4 is deep-copied VERBATIM inside the
    // qualifying item, never visited (the bounded-depth contract,
    // SURVEY data-model note "model 3 levels").
    val itemH = lf(
      """{"linkId":"h23","text":"Q\"uo\\te\n中🎉","answer":[{"valueString":"A\"x\\y\tz"},{"valueString":""}]}""")
    val itemE = lf(
      """{"linkId":"ea","text":"Empty 19","answer":[]},{"linkId":"g19","item":[{"linkId":"w19","item":[{"linkId":"problemStatus","answer":[{"valueString":"active"}],"item":[{"linkId":"level4","answer":[{"valueString":"deep"}]}]}]}]}""")
    val items = caseOf(
      Seq(eqk(23) -> itemH, eqk(19) -> itemE,
        mod(4, 0) -> item0, mod(4, 1) -> item1, mod(4, 2) -> item2),
      item3)
    cat(
      lf("""{"resourceType":"QuestionnaireResponse","id":"QR"""), k,
      lf("""","status":"completed","questionnaire":"https://old.example/Questionnaire/legacy","item":["""),
      items, lf("""],"authored":"2024-06-01"}"""))
  }

  /** What [[QuestionnaireRestructure.convertQr]] must emit for [[qrInput]]:
    * field order preserved (questionnaire/item replaced in place, trailing
    * `authored` untouched), one comments section always, the problem list
    * only when a qualifying sub-item was found.
    */
  private def qrExpected: Frag = {
    val cit0 = cat(
      lf("""{"linkId":"questions","item":[{"linkId":"question","answer":[{"valueString":"Question """),
      k, lf(""""}]},{"linkId":"answer","answer":[{"valueString":"A"""), k,
      lf(""""},{"valueInteger":"""), k, lf("}]}]}"))
    val cit2 = cat(
      lf("""{"linkId":"questions","item":[{"linkId":"question","answer":[{"valueString":"Both """),
      k, lf(""""}]},{"linkId":"answer","answer":[{"valueString":"B"""), k,
      lf(""""}]}]}"""))
    // Key 23: the hostile strings round-trip with identical escapes.
    // Key 19: zero-answer Q/A pair is still emitted (empty answer array).
    val citH = lf(
      """{"linkId":"questions","item":[{"linkId":"question","answer":[{"valueString":"Q\"uo\\te\n中🎉"}]},{"linkId":"answer","answer":[{"valueString":"A\"x\\y\tz"},{"valueString":""}]}]}""")
    val citE = lf(
      """{"linkId":"questions","item":[{"linkId":"question","answer":[{"valueString":"Empty 19"}]},{"linkId":"answer","answer":[]}]}""")
    val citems = caseOf(
      Seq(eqk(23) -> citH, eqk(19) -> citE,
        mod(4, 0) -> cit0, mod(4, 2) -> cit2), lf(""))
    val pr1 = cat(
      lf(""",{"linkId":"LOINC/11450-4","text":"Problem list","item":[{"linkId":"problem","text":"Problem","item":[{"linkId":"problemCode","text":"Problem Code","answer":[{"valueCoding":{"system":"http://snomed.info/sct","code":"C"""),
      k,
      lf(""""}}]},{"linkId":"problemStatus","answer":[{"valueString":"active"}]},{"linkId":"problemSignificance","answer":[{"valueString":"major"}]}]}]}"""))
    val pr2 = cat(
      lf(""",{"linkId":"LOINC/11450-4","text":"Problem list","item":[{"linkId":"problem","text":"Problem","item":[{"linkId":"problemType","answer":[{"valueString":"T"""),
      k, lf(""""}]}]}]}"""))
    // Key 19: the qualifying problemStatus sub-sub is copied VERBATIM —
    // including its own 4th-level item[] the 3-level walk never visits.
    val prE = lf(
      """,{"linkId":"LOINC/11450-4","text":"Problem list","item":[{"linkId":"problem","text":"Problem","item":[{"linkId":"problemStatus","answer":[{"valueString":"active"}],"item":[{"linkId":"level4","answer":[{"valueString":"deep"}]}]}]}]}""")
    val problems = caseOf(
      Seq(eqk(23) -> lf(""), eqk(19) -> prE,
        mod(4, 1) -> pr1, mod(4, 2) -> pr2), lf(""))
    cat(
      lf("""{"resourceType":"QuestionnaireResponse","id":"QR"""), k,
      lf("""","status":"completed","questionnaire":"""" +
        QuestionnaireRestructure.QuestionnaireUrl +
        """","item":[{"linkId":"LOINC/61149-1","text":"Comments and advice","item":["""),
      citems, lf("]}"), problems, lf("""],"authored":"2024-06-01"}"""))
  }

  private val q139_qr_restructure = Q(
    run = (s, d) =>
      Tables.nation(s, d).select(
        col("n_nationkey"),
        QuestionnaireRestructure.restructureQr(qrInput.col).as("doc")),
    oracle = Some(
      s"SELECT n_nationkey, ${qrExpected.sql} AS doc FROM nation"),
    doc = "T5 QuestionnaireResponse restructure, byte-identical JSON oracle")

  /** r12 hostile bundle shapes (VERDICT r11 #4), same wrapper on input and
    * expected so both sides stay symmetric: key 19 = 0-entry bundle (the
    * rewrite is a no-op reserialization), key 23 = QR-only bundle (no
    * Patient), key 17 = a resource-LESS entry preserved verbatim ahead of
    * the QR entry.
    */
  private def bundleWrap(resource: Frag): Frag = caseOf(
    Seq(
      eqk(19) -> lf("""{"resourceType":"Bundle","type":"collection","entry":[]}"""),
      eqk(23) -> cat(
        lf("""{"resourceType":"Bundle","type":"collection","entry":[{"fullUrl":"urn:uuid:qr-"""),
        k, lf("""","resource":"""), resource, lf("}]}")),
      eqk(17) -> cat(
        lf("""{"resourceType":"Bundle","type":"collection","entry":[{"fullUrl":"urn:uuid:nores-"""),
        k, lf(""""},{"fullUrl":"urn:uuid:qr-"""), k, lf("""","resource":"""),
        resource, lf("}]}"))),
    cat(
      lf("""{"resourceType":"Bundle","type":"collection","entry":[{"fullUrl":"urn:uuid:pat-"""),
      k, lf("""","resource":{"resourceType":"Patient","id":"P"""), k,
      lf(""""}},{"fullUrl":"urn:uuid:qr-"""), k, lf("""","resource":"""),
      resource, lf("}]}")))

  private val q141_bundle_qr_rewrite = Q(
    run = (s, d) =>
      Tables.nation(s, d).select(
        col("n_nationkey"),
        QuestionnaireRestructure.restructureBundle(bundleWrap(qrInput).col)
          .as("doc")),
    oracle = Some(
      s"SELECT n_nationkey, ${bundleWrap(qrExpected).sql} AS doc FROM nation"),
    doc = "T6 Bundle rewrite: QR entries converted, other resources verbatim")

  /** T4: the A04 message conversion on a per-row transaction bundle —
    * 0 / 1 / 2 Encounter entries cycle on the key so the focus list hits
    * empty, singleton and multi shapes. uuid is the pinned test column
    * (production passes `uuid()`).
    */
  private val q140_bundle_a04 = Q(
    run = (s, d) => {
      val uuid = cat(lf("00000000-0000-4000-8000-"),
        Frag(lpad(col("n_nationkey").cast("string"), 12, "0"),
          "lpad(CAST(n_nationkey AS VARCHAR), 12, '0')"))
      val enc1 = cat(
        lf("""{"fullUrl":"urn:uuid:enc-"""), k,
        lf("""","resource":{"resourceType":"Encounter","id":"E"""), k,
        lf("""","status":"finished"}}"""))
      val enc2 = cat(
        lf("""{"fullUrl":"urn:uuid:enc2-"""), k,
        lf("""","resource":{"resourceType":"Encounter","id":"E2-"""), k,
        lf("""","status":"planned"}}"""))
      val pat = cat(
        lf("""{"fullUrl":"urn:uuid:pat-"""), k,
        lf("""","resource":{"resourceType":"Patient","id":"P"""), k,
        lf(""""}}"""))
      val entries = caseOf(
        Seq(eqk(23) -> lf(""), mod(5, 0) -> pat,
          mod(3, 0) -> cat(enc1, lf(","), pat, lf(","), enc2)),
        cat(enc1, lf(","), pat))
      // r12 hostile shapes: key 23 = "entry":[] (header becomes the sole
      // entry), key 19 = NO entry field at all (Jackson's withArray creates
      // it AFTER the appended identifier — pinned field order).
      val bundleIn = caseOf(
        Seq(eqk(19) ->
          lf("""{"resourceType":"Bundle","type":"transaction"}""")),
        cat(
          lf("""{"resourceType":"Bundle","type":"transaction","entry":["""),
          entries, lf("]}")))
      Tables.nation(s, d).select(
        col("n_nationkey"),
        FhirBuilders.bundleToMessageA04(bundleIn.col, uuid.col).as("doc"))
    },
    oracle = Some {
      val uuid = cat(lf("00000000-0000-4000-8000-"),
        Frag(lit(""), "lpad(CAST(n_nationkey AS VARCHAR), 12, '0')"))
      val f1 = cat(lf("""{"reference":"urn:uuid:enc-"""), k,
        lf("""","type":"Encounter"}"""))
      val f2 = cat(lf("""{"reference":"urn:uuid:enc2-"""), k,
        lf("""","type":"Encounter"}"""))
      val focus = caseOf(
        Seq(eqk(23) -> lf(""), eqk(19) -> lf(""),
          mod(5, 0) -> lf(""), mod(3, 0) -> cat(f1, lf(","), f2)), f1)
      val enc1 = cat(
        lf("""{"fullUrl":"urn:uuid:enc-"""), k,
        lf("""","resource":{"resourceType":"Encounter","id":"E"""), k,
        lf("""","status":"finished"}}"""))
      val enc2 = cat(
        lf("""{"fullUrl":"urn:uuid:enc2-"""), k,
        lf("""","resource":{"resourceType":"Encounter","id":"E2-"""), k,
        lf("""","status":"planned"}}"""))
      val pat = cat(
        lf("""{"fullUrl":"urn:uuid:pat-"""), k,
        lf("""","resource":{"resourceType":"Patient","id":"P"""), k,
        lf(""""}}"""))
      val entries = caseOf(
        Seq(mod(5, 0) -> pat,
          mod(3, 0) -> cat(enc1, lf(","), pat, lf(","), enc2)),
        cat(enc1, lf(","), pat))
      // key 23: empty input entry[] -> the header is the SOLE entry (no
      // comma, no original entries).
      val entriesTail = caseOf(
        Seq(eqk(23) -> lf("")), cat(lf(","), entries))
      val header = cat(
        lf("""{"fullUrl":"urn:uuid:"""), uuid,
        lf("""","resource":{"resourceType":"MessageHeader","eventCoding":{"system":"http://terminology.hl7.org/CodeSystem/v2-0003","code":"A04"},"destination":[{"endpoint":"""" +
          graft.etl.MessageA04.DefaultEndpoint +
          """","receiver":{"identifier":{"system":"https://fhir.nhs.uk/Id/ods-organization-code","value":"""" +
          graft.etl.MessageA04.DefaultOds +
          """"}}}],"sender":{"identifier":{"system":"https://fhir.nhs.uk/Id/ods-organization-code","value":"""" +
          graft.etl.MessageA04.DefaultOds +
          """"}},"source":{"endpoint":"""" +
          graft.etl.MessageA04.DefaultEndpoint +
          """"},"focus":["""),
        focus, lf("]}}"))
      // key 19: the input had NO entry field, so Jackson appends identifier
      // FIRST (putObject) and creates entry LAST (withArray) — the field
      // order flips vs the in-place default.
      val expected = caseOf(
        Seq(eqk(19) -> cat(
          lf("""{"resourceType":"Bundle","type":"message","identifier":{"system":"urn:ietf:rfc:3986","value":"urn:uuid:"""),
          uuid, lf(""""},"entry":["""), header, lf("]}"))),
        cat(
          lf("""{"resourceType":"Bundle","type":"message","entry":["""),
          header, entriesTail,
          lf("""],"identifier":{"system":"urn:ietf:rfc:3986","value":"urn:uuid:"""),
          uuid, lf(""""}}""")))
      s"SELECT n_nationkey, ${expected.sql} AS doc FROM nation"
    },
    doc = "T4 Bundle -> A04 message: header prepended, Encounter focus list")

  /** U3 + T3: role field-diff upsert planning over a synthetic merged
    * frame derived from customer — insert / active-flip / period-drift /
    * noop rows all present — emitting the action, both diff predicates,
    * and the byte-identical PractitionerRole document.
    */
  private val q142_role_upsert_actions = Q(
    run = (s, d) => {
      val key = col("c_custkey")
      val merged = Tables.customer(s, d).select(
        key.as("src_key"),
        concat(lit("G"), key).as("GMP"),
        col("c_name").as("Practitioner_Name"),
        concat(lit("O"), key % 50).as("ODS"),
        col("c_mktsegment").as("Organisation_Name"),
        lit("px").as("_id_x"), lit("ox").as("_id_y"),
        when(key % 4 === 3, lit(""))
          .when(key % 4 === 2, lit("20210315"))
          .otherwise(lit("20200101")).as("Started"),
        when(key % 5 === 0, lit("20221231")).otherwise(lit("")).as("Ended"),
        when(key % 7 === 0, lit(""))
          .otherwise(concat(lit("id"), key)).as("_id"),
        when(key % 7 === 0, lit(null).cast("string"))
          .otherwise(concat(
            lit("""{"resourceType":"PractitionerRole","active":"""),
            when(key % 11 === 0, lit("false")).otherwise(lit("true")),
            lit(""","period":{"start":"2020-01-01""""),
            when(key % 13 === 0, lit(""","end":"2022-12-31""""))
              .otherwise(lit("")),
            lit("}}"))).as("ResourceString"))
      OdsImport.planRoles(merged).select(
        col("src_key"), col("action"),
        col("active_changed"), col("period_changed"), col("doc"))
    },
    oracle = Some("""
      WITH src AS (
        SELECT c_custkey AS src_key, c_name, c_mktsegment,
          CASE WHEN c_custkey % 4 = 3 THEN ''
               WHEN c_custkey % 4 = 2 THEN '20210315'
               ELSE '20200101' END AS started,
          CASE WHEN c_custkey % 5 = 0 THEN '20221231' ELSE '' END AS ended,
          CASE WHEN c_custkey % 7 = 0 THEN ''
               ELSE 'id' || c_custkey END AS _id,
          CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE
            '{"resourceType":"PractitionerRole","active":' ||
            CASE WHEN c_custkey % 11 = 0 THEN 'false' ELSE 'true' END ||
            ',"period":{"start":"2020-01-01"' ||
            CASE WHEN c_custkey % 13 = 0
                 THEN ',"end":"2022-12-31"' ELSE '' END ||
            '}}' END AS stored
        FROM customer),
      flags AS (
        SELECT *,
          coalesce(json_extract_string(stored, '$.active'), 'true') <>
            CASE WHEN ended <> '' THEN 'false' ELSE 'true' END
            AS active_changed,
          (coalesce(json_extract_string(stored, '$.period.start'), '') <>
             CASE WHEN started = '' THEN ''
                  ELSE substr(started,1,4) || '-' || substr(started,5,2)
                       || '-' || substr(started,7,2) END)
          OR
          (coalesce(json_extract_string(stored, '$.period.end'), '') <>
             CASE WHEN ended = '' THEN ''
                  ELSE substr(ended,1,4) || '-' || substr(ended,5,2)
                       || '-' || substr(ended,7,2) END) AS period_changed
        FROM src)
      SELECT src_key,
        CASE WHEN _id = '' THEN 'insert'
             WHEN active_changed OR period_changed THEN 'update'
             ELSE 'noop' END AS action,
        active_changed, period_changed,
        -- null-propagation contract, pinned (not inherited): a NULL
        -- display is OMITTED from the document (Spark to_json drops null
        -- struct fields), never allowed to NULL the whole doc via ||
        '{"resourceType":"PractitionerRole","active":' ||
        CASE WHEN ended <> '' THEN 'false' ELSE 'true' END ||
        ',"practitioner":{"identifier":{"system":"https://fhir.hl7.org.uk/Id/gmp-number","value":"G'
        || src_key || '"},' ||
        CASE WHEN c_name IS NULL THEN ''
             ELSE '"display":' || to_json(c_name) || ',' END ||
        '"reference":"Practitioner/px"},"organization":{"identifier":{"system":"https://fhir.nhs.uk/Id/ods-organization-code","value":"O'
        || (src_key % 50) || '"},' ||
        CASE WHEN c_mktsegment IS NULL THEN ''
             ELSE '"display":' || to_json(c_mktsegment) || ',' END ||
        '"reference":"Organization/ox"},"code":[{"coding":[{"system":"http://snomed.info/sct","code":"62247001","display":"General practitioner"}]}],"specialty":[{"coding":[{"system":"http://snomed.info/sct","code":"394814009","display":"General practice (specialty) (qualifier value)"}]}],"period":{'
        || CASE WHEN started <> ''
                THEN '"start":"' || substr(started,1,4) || '-' ||
                     substr(started,5,2) || '-' || substr(started,7,2) || '"'
                ELSE '' END
        || CASE WHEN ended <> ''
                THEN (CASE WHEN started <> '' THEN ',' ELSE '' END) ||
                     '"end":"' || substr(ended,1,4) || '-' ||
                     substr(ended,5,2) || '-' || substr(ended,7,2) || '"'
                ELSE '' END
        || '}' ||
        CASE WHEN _id <> '' THEN ',"id":"' || _id || '"' ELSE '' END ||
        '}' AS doc
      FROM flags"""),
    doc = "U3 role-diff upsert actions + byte-identical T3 " +
      "PractitionerRole document")

  val all: Seq[(String, Q)] = Seq(
    "q139_qr_restructure" -> q139_qr_restructure,
    "q140_bundle_a04" -> q140_bundle_a04,
    "q141_bundle_qr_rewrite" -> q141_bundle_qr_rewrite,
    "q142_role_upsert_actions" -> q142_role_upsert_actions)
}
