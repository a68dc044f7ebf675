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
}
