package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JsonLinesSource

class JsonLinesSourceSpec extends AnyFunSuite {
  import TestSpark._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("well-formed lines parse; malformed lines quarantine, not fail") {
    val dir = Files.createTempDirectory("jsonl").toFile
    val f = new java.io.File(dir, "feed.json")
    val w = new java.io.PrintWriter(f)
    w.println("""{"id": 1, "name": "alpha", "score": 0.5}""")
    w.println("""{"id": 2, "name": "beta"}""")           // missing field -> null
    w.println("""{"id": 3, "name": "gamma", "score": }""") // malformed
    w.println("""not json at all""")                      // malformed
    w.close()
    val parsed = JsonLinesSource.readWithQuarantine(spark, f.getPath, schema)
    val (good, bad) = JsonLinesSource.splitQuarantine(parsed)
    val goodRows = good.orderBy(col("id")).collect()
    assert(goodRows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(goodRows(1).isNullAt(2)) // missing score parses as null, not corrupt
    val badLines = bad.collect().map(_.getString(0)).toSet
    assert(badLines.size === 2)
    assert(badLines.exists(_.contains("not json at all")))
  }

  test("round-trips a frame through JSON-lines with schema intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jsonl_rt").toFile
    val out = new java.io.File(dir, "out").getPath
    val df = Seq((1L, "a", 0.25), (2L, "b", 0.5)).toDF("id", "name", "score")
    JsonLinesSource.write(df, out)
    val back = JsonLinesSource.readWithQuarantine(spark, out, schema)
    val (good, bad) = JsonLinesSource.splitQuarantine(back)
    assert(bad.count() === 0)
    assert(good.orderBy(col("id")).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "a", 0.25), (2L, "b", 0.5)))
  }

  test("declared schema prunes undeclared JSON fields on read") {
    val dir = Files.createTempDirectory("jsonl_pr").toFile
    val f = new java.io.File(dir, "wide.json")
    val w = new java.io.PrintWriter(f)
    w.println("""{"id": 1, "name": "x", "score": 1.0, "extra": "ignored", "huge": [1,2,3]}""")
    w.close()
    val (good, bad) = JsonLinesSource.splitQuarantine(
      JsonLinesSource.readWithQuarantine(spark, f.getPath, schema))
    assert(bad.count() === 0)
    assert(good.columns.toSeq === Seq("id", "name", "score"))
    assert(good.collect().head.getLong(0) === 1L)
  }
}
