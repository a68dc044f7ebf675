package graft.sources

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.OdsImport

class ZipCsvSpec extends SparkSpec {
  import spark.implicits._

  private def makeZip(member: String, content: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("zipcsv").toFile
    val f = new java.io.File(dir, "epraccur.zip")
    val zos = new ZipOutputStream(new FileOutputStream(f))
    zos.putNextEntry(new ZipEntry("readme.txt"))
    zos.write("ignore me".getBytes)
    zos.putNextEntry(new ZipEntry(member))
    zos.write(content.getBytes)
    zos.close()
    f.getAbsolutePath
  }

  test("S1: unzips the csv member in executors and applies the schema") {
    val csv = (Seq.fill(24)("") match { case pad =>
      Seq(
        ("B86030" +: "THE SURGERY" +: "Y56" +: pad).take(26).mkString(","),
        ("C55555" +: "OTHER" +: "" +: pad).take(26).mkString(","))
    }).mkString("\n")
    val path = makeZip("epraccur.csv", csv)
    val df = ZipCsv.read(spark, path, OdsImport.epraccurSchema)
    assert(df.count() == 2)
    val got = df.select("ODS", "Organisation_Name", "NationalGrouping")
      .as[(String, String, Option[String])].collect().sortBy(_._1)
    assert(got(0) == (("B86030", "THE SURGERY", Some("Y56"))))
    assert(got(1)._1 == "C55555")
  }

  test("S1: non-matching members are skipped") {
    val path = makeZip("data.bin", "garbage,bytes")
    val df = ZipCsv.read(spark, path, OdsImport.epraccurSchema)
    assert(df.count() == 0)
  }

  // ---- the DSv2 connector (spark.read.format("zipcsv")) ----

  /** A directory of two archives with quoted/escaped/empty fields and a
    * skipped non-csv member — the DSv2 rows must match [[ZipCsv.read]]'s
    * (Spark CSV reader) on the same bytes, field for field.
    */
  private def makeZipDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("zipcsv-v2").toFile
    def zip(name: String, entries: (String, String)*): Unit = {
      val zos = new ZipOutputStream(
        new FileOutputStream(new java.io.File(dir, name)))
      entries.foreach { case (member, content) =>
        zos.putNextEntry(new ZipEntry(member))
        zos.write(content.getBytes("UTF-8"))
      }
      zos.close()
    }
    zip("a.zip",
      "skip.bin" -> "not,csv",
      "a.csv" -> Seq(
        "A1,\"Name, with comma\",x",
        "A2,\"He said \"\"hi\"\"\",", // escaped quotes + trailing empty
        "A3,,plain").mkString("\n"))
    zip("b.zip", "b.csv" -> "B1,second archive,y")
    dir.getAbsolutePath
  }

  private val v2Schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("k",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("name",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("v",
      org.apache.spark.sql.types.StringType)))

  test("DSv2 zipcsv: short-name registration, one partition per archive, " +
      "rows byte-identical to the binaryFiles path on quoted/escaped/" +
      "empty fields") {
    val dir = makeZipDir()
    val v2 = spark.read.format("zipcsv").schema(v2Schema).load(dir)
    val v1 = ZipCsv.read(spark, dir + "/*", v2Schema)
    assert(v2.rdd.getNumPartitions == 2) // one task per archive
    val a = v2.as[(Option[String], Option[String], Option[String])]
      .collect().sortBy(_._1)
    val b = v1.as[(Option[String], Option[String], Option[String])]
      .collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq, s"v2 ${a.toSeq} vs v1 ${b.toSeq}")
    assert(a.map(_._1.get).toSeq == Seq("A1", "A2", "A3", "B1"))
    assert(a(0)._2.contains("Name, with comma"))
    assert(a(1)._2.contains("He said \"hi\""))
    assert(a(2)._2.isEmpty) // unquoted empty -> NULL, both paths
  }

  test("DSv2 zipcsv: column pruning reaches the reader (pruned read " +
      "schema) and a limit pushes into the scan") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val dir = makeZipDir()
    val df = spark.read.format("zipcsv").schema(v2Schema).load(dir)
      .select("v").limit(2)
    val scan = df.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.head
      .scan.asInstanceOf[ZipCsvScan]
    assert(scan.readSchema().fieldNames.toSeq == Seq("v"),
      s"expected pruned read schema, got ${scan.readSchema()}")
    assert(scan.pushedLimit == 2, s"limit not pushed: ${scan.description()}")
    assert(df.as[String].collect().length == 2)
    // pruning is positional: reading only column k (position 0) must
    // never touch the malformed tail of a line — split stops at field 1
    val kOnly = spark.read.format("zipcsv").schema(v2Schema).load(dir)
      .select("k")
    assert(kOnly.as[String].collect().sorted.toSeq ==
      Seq("A1", "A2", "A3", "B1"))
  }

  test("DSv2 zipcsv: glob path (dir/*.zip) resolves at planning time, " +
      "same rows as the v1 glob read") {
    val dir = makeZipDir()
    val v2 = spark.read.format("zipcsv").schema(v2Schema)
      .load(dir + "/*.zip")
    val v1 = ZipCsv.read(spark, dir + "/*.zip", v2Schema)
    assert(v2.select("k").as[String].collect().sorted.toSeq ==
      v1.select("k").as[String].collect().sorted.toSeq)
    assert(v2.count() == 4)
  }

  test("DSv2 zipcsv: blank interior lines and quoted-empty fields match " +
      "the v1 path (blank skipped, quoted-empty null like unquoted)") {
    val dir = java.nio.file.Files.createTempDirectory("zipcsv-blank").toFile
    val zos = new ZipOutputStream(
      new FileOutputStream(new java.io.File(dir, "x.zip")))
    zos.putNextEntry(new ZipEntry("x.csv"))
    zos.write(Seq(
      "A1,\"\",x", // quoted empty -> NULL (nullValue="" post-unquote)
      "",          // blank line -> skipped entirely, not an all-null row
      "A2,b,y").mkString("\n").getBytes("UTF-8"))
    zos.close()
    val p = dir.getAbsolutePath
    val v2 = spark.read.format("zipcsv").schema(v2Schema).load(p)
    val v1 = ZipCsv.read(spark, p + "/*", v2Schema)
    val a = v2.as[(Option[String], Option[String], Option[String])]
      .collect().sortBy(_._1).toSeq
    val b = v1.as[(Option[String], Option[String], Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(a == b, s"v2 $a vs v1 $b")
    assert(a.size == 2) // the blank line yields NO row on either path
    assert(a(0)._2.isEmpty) // quoted empty -> NULL, both paths
  }

  test("DSv2 zipcsv: filter pushdown prunes rows at the parser, stays " +
      "residual, and matches the unpushed result (v1 == v2 == pushed-v2)") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val dir = makeZipDir()
    def scanOf(df: org.apache.spark.sql.DataFrame): ZipCsvScan =
      df.queryExecution.executedPlan
        .collect { case b: BatchScanExec => b }.head
        .scan.asInstanceOf[ZipCsvScan]
    // filter column (v) NOT in the projection: split must still reach it
    val pushed = spark.read.format("zipcsv").schema(v2Schema).load(dir)
      .filter(col("v") === "x" || col("v").isNull).select("k")
    val sc = scanOf(pushed)
    assert(sc.filters.nonEmpty,
      s"no filters pushed: ${sc.description()}")
    assert(sc.description().contains("PushedFilters"))
    val got = pushed.as[String].collect().sorted.toSeq
    val v1 = ZipCsv.read(spark, dir + "/*", v2Schema)
      .filter(col("v") === "x" || col("v").isNull)
      .select("k").as[String].collect().sorted.toSeq
    assert(got == v1 && got == Seq("A1", "A2"), s"pushed $got vs v1 $v1")
    // equality + IN + startswith compose; null-field rows never match =
    val f2 = spark.read.format("zipcsv").schema(v2Schema).load(dir)
      .filter(col("k").isin("A1", "B1") && col("name").startsWith("N"))
    assert(scanOf(f2).filters.length == 3) // isnotnull(name) + in + sw
    assert(f2.select("k").as[String].collect().toSeq == Seq("A1"))
    // unsupported (non-string typed compare) filters simply don't push
    val f3 = spark.read.format("zipcsv").schema(v2Schema).load(dir)
      .filter(length(col("k")) === 2)
    assert(scanOf(f3).filters.forall(_.references.sameElements(Array("k"))))
    assert(f3.count() == 4)
  }

  test("DSv2 zipcsv: schema inference sniffs the first member line " +
      "(all-string positional c1..cN)") {
    val dir = makeZipDir()
    val inferred = spark.read.format("zipcsv").load(dir)
    assert(inferred.schema.fieldNames.toSeq == Seq("c1", "c2", "c3"))
    assert(inferred.count() == 4)
  }

  test("DSv2 zipcsv: ODS epraccur end to end through the positional " +
      "schema, same result as the v1 source") {
    val pad = Seq.fill(24)("")
    val csv = Seq(
      ("B86030" +: "THE SURGERY" +: "Y56" +: pad).take(26).mkString(","),
      ("C55555" +: "OTHER" +: "" +: pad).take(26).mkString(",")).mkString("\n")
    val path = makeZip("epraccur.csv", csv)
    val df = spark.read.format("zipcsv")
      .schema(OdsImport.epraccurSchema).load(path)
    val got = df.select("ODS", "Organisation_Name", "NationalGrouping")
      .as[(String, String, Option[String])].collect().sortBy(_._1)
    assert(got(0) == (("B86030", "THE SURGERY", Some("Y56"))))
    assert(got(1) == (("C55555", "OTHER", None)))
  }
}
