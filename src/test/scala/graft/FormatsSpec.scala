package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Formats

/** The format contracts FormatsSpec exists to pin: CSV survives
  * adversarial content (delimiters, quotes, newlines, null vs empty),
  * ORC and JSONL round-trip types faithfully, and JSONL quarantines
  * corrupt records instead of silently nulling rows. */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  private def nasty = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1L, "plain", 1.5),
      Row(2L, "comma, inside", 2.5),
      Row(3L, "quote \" inside", null),
      Row(4L, "line\nbreak", 4.5),
      Row(5L, null, 5.5),                 // null text
      Row(6L, "", 6.5),                   // empty text — must stay ""
      Row(7L, "trailing space ", 7.5)),
    schema)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-fmt-$tag").toString

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet

  test("CSV round-trips adversarial content, null != empty string") {
    val dir = tmp("csv")
    Formats.writeCsv(nasty, dir)
    val back = Formats.readCsv(spark, dir, schema)
    assert(asSet(back) == asSet(nasty))
    // explicitly: row 5 stays null, row 6 stays empty
    val m = back.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(m(5L).isEmpty && m(6L).contains(""))
  }

  test("ORC round-trips values and schema") {
    val dir = tmp("orc")
    Formats.writeOrc(nasty, dir)
    val back = Formats.readOrc(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(asSet(back) == asSet(nasty))
  }

  test("JSONL round-trips and quarantines corrupt records") {
    val dir = tmp("jsonl")
    Formats.writeJsonl(nasty, dir)
    val clean = Formats.readJsonl(spark, dir, schema).cache()
    try {
      assert(clean.where(org.apache.spark.sql.functions.col("_corrupt_record")
        .isNotNull).count() == 0)
      assert(asSet(clean.drop("_corrupt_record")) == asSet(nasty))
    } finally clean.unpersist()
    // a hand-broken line lands in the corrupt column, not a silent null row
    val dir2 = tmp("jsonl2")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir2, "part-broken.json"),
      "{\"id\": 9, \"text\": \"ok\", \"score\": 9.5}\n{not json at all\n"
        .getBytes("UTF-8"))
    // Spark disallows queries whose only referenced column is the corrupt
    // record column over raw JSON — cache first, the documented pattern
    val mixed = Formats.readJsonl(spark, dir2, schema).cache()
    try {
      assert(mixed.where(org.apache.spark.sql.functions.col("_corrupt_record")
        .isNotNull).count() == 1)
      assert(mixed.where(org.apache.spark.sql.functions.col("id") === 9)
        .count() == 1)
    } finally mixed.unpersist()
  }
}
