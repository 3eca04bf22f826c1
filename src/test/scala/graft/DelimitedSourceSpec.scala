package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DelimitedSource

/** Round-trip + filename-semantics tests for the pipe-delimited source. */
class DelimitedSourceSpec extends AnyFunSuite {
  import TestSpark._

  test("pipe-delimited round trip preserves data and nulls") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/people"
    val df = Tables.customer(spark, Sf)
      .select(col("c_custkey").cast("string"),
              col("c_name"),
              when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_mktsegment"))
                .as("c_mktsegment"))
    DelimitedSource.write(df, dir)
    val back = DelimitedSource.read(spark, dir)
    assert(back.count() === df.count())
    assert(back.columns.toSeq === df.columns.toSeq)
    val nullsIn = df.filter(col("c_mktsegment").isNull).count()
    val nullsOut = back.filter(col("c_mktsegment").isNull).count()
    assert(nullsIn === nullsOut)
  }

  test("null vocabulary is normalized on read") {
    val dir = Files.createTempDirectory("graft_csv2").toString
    Files.writeString(java.nio.file.Paths.get(dir, "t_20250828.txt"),
      "a|b\n1|NULL\n2|null\n3|None\n4|\n5|x\n")
    val got = DelimitedSource.read(spark, dir)
    assert(got.filter(col("b").isNull).count() === 4)
    assert(got.filter(col("b") === "x").count() === 1)
  }

  test("malformed rows are captured, not dropped or fatal") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_csv3").toString
    Files.writeString(java.nio.file.Paths.get(dir, "t.txt"),
      "a|b\n1|x\nnot_a_number|y\n3|z\n")
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))
    val got = DelimitedSource.readWithQuarantine(spark, dir, schema)
    assert(got.count() === 3)
    val bad = got.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length === 1 && bad.head.getAs[String]("_corrupt_record")
      .contains("not_a_number"))
  }

  test("table name extraction follows reference rules") {
    assert(DelimitedSource.tableNameOf("SAMPLE_chhsca_people_20250828.txt") === "people")
    assert(DelimitedSource.tableNameOf("chhsca_people_20250828.txt") === "people")
    assert(DelimitedSource.tableNameOf("people_20250828.txt") === "people")
    assert(DelimitedSource.tableNameOf("people.txt") === "people")
    assert(DelimitedSource.tableNameOf("service_episodes_20240101.csv") === "service_episodes")
    assert(DelimitedSource.tableNameOf("20240101.txt") === "unknown_table")
  }

  test("file date extraction validates digits") {
    assert(DelimitedSource.fileDateOf("people_20250828.txt") === Some("20250828"))
    assert(DelimitedSource.fileDateOf("people_20251499.txt") === None)
    assert(DelimitedSource.fileDateOf("people.txt") === None)
  }

  // Quoting parity matrix vs the reference's pandas reader
  // (doublequote=True default): embedded delimiters, RFC-4180 doubled
  // quotes, and the null vocabulary must parse identically.
  test("quoting matrix: embedded delimiter, doubled quote, null vocab") {
    val dir = Files.createTempDirectory("graft_csv4").toString
    Files.writeString(java.nio.file.Paths.get(dir, "m.txt"),
      "id|name|note\n" +
        "1|\"pi|pe\"|plain\n" +          // delimiter inside quotes
        "2|\"say \"\"hi\"\" now\"|x\n" + // RFC doubled quote
        "3|\"\"|None\n" +                // explicitly-quoted empty + None
        "4|null|\"NULL\"\n")             // null vocab, quoted variant
    val got = DelimitedSource.read(spark, dir)
      .collect()
      .map(r => r.getAs[String]("id") ->
        (r.getAs[String]("name"), r.getAs[String]("note"))).toMap
    assert(got("1") === (("pi|pe", "plain")))
    assert(got("2") === (("say \"hi\" now", "x")))     // pandas parse
    assert(got("3") === ((null, null)))                // "" and None are null
    assert(got("4") === ((null, null)))                // null and "NULL"
  }

  test("doubled quotes survive a write -> read round trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_csv5").toString + "/rt"
    val df = Seq(("1", "say \"hi\"|ok"), ("2", "plain")).toDF("id", "v")
    DelimitedSource.write(df, dir)
    val back = DelimitedSource.read(spark, dir).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("v")).toMap
    assert(back("1") === "say \"hi\"|ok")
    assert(back("2") === "plain")
  }

  test("typed schema read parses numerics and dates once, not per query") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_csv6").toString
    Files.writeString(java.nio.file.Paths.get(dir, "t.txt"),
      "k|amt|d\n1|12.50|2024-01-02\n2|None|2024-02-03\n")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("amt", DoubleType),
      StructField("d", DateType)))
    val got = DelimitedSource.read(spark, dir, Some(schema))
    assert(got.schema.map(_.dataType) ===
      Seq(LongType, DoubleType, DateType))
    val rows = got.orderBy(col("k")).collect()
    assert(rows(0).getAs[Double]("amt") === 12.50)
    assert(rows(0).getAs[java.sql.Date]("d").toString === "2024-01-02")
  }
}
