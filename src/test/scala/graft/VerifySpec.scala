package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Verify.dump must make failures LOUD: round 5 shipped 9 broken queries
  * invisibly because a thrown query simply vanished from the artifact.
  */
class VerifySpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("verify-spec").toString

  test("a throwing query produces errors.json + _ERROR.txt, not silence") {
    val out = tmpDir()
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => s.range(3).toDF("id")
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("deliberate failure")
    val errs = Verify.dump(spark, sf(), out,
      Seq("good_q" -> ok, "bad_q" -> boom))

    assert(errs.keySet == Set("bad_q"))
    assert(errs("bad_q").contains("deliberate failure"))
    // artifact rows: good query has parquet, bad query has the marker
    assert(new java.io.File(s"$out/good_q").listFiles()
      .exists(_.getName.endsWith(".parquet")))
    val badFiles = new java.io.File(s"$out/bad_q").listFiles().map(_.getName)
    assert(badFiles.contains("_ERROR.txt"))
    assert(!badFiles.exists(_.endsWith(".parquet")))
    val errJson = Files.readString(java.nio.file.Paths.get(s"$out/errors.json"))
    assert(errJson.contains("bad_q") && errJson.contains("deliberate failure"))
  }

  test("a failure after partial output scrubs the stale parquet") {
    val out = tmpDir()
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => s.range(3).toDF("id")
    // first run: q succeeds and leaves parquet behind
    assert(Verify.dump(spark, sf(), out, Seq("q" -> ok)).isEmpty)
    // second run: same name now fails — stale success must not survive
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("now broken")
    val errs = Verify.dump(spark, sf(), out, Seq("q" -> boom))
    assert(errs.contains("q"))
    val files = new java.io.File(s"$out/q").listFiles().map(_.getName)
    assert(files.contains("_ERROR.txt"))
    assert(!files.exists(_.endsWith(".parquet")))
  }

  test("all-green dump writes an empty errors.json") {
    val out = tmpDir()
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => s.range(1).toDF("id")
    assert(Verify.dump(spark, sf(), out, Seq("q" -> ok)).isEmpty)
    assert(Files.readString(
      java.nio.file.Paths.get(s"$out/errors.json")).trim == "{}")
  }
}
