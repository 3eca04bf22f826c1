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
}
