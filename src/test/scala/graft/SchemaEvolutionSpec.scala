package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SchemaEvolution

class SchemaEvolutionSpec extends AnyFunSuite {
  import TestSpark._

  test("generations with different schemas read merged; defaults backfill") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_evo").toString + "/t"
    // generation 1: (id, name)
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$base/gen=1")
    // generation 2: adds a column
    Seq((3L, "c", 0.5)).toDF("id", "name", "score")
      .write.parquet(s"$base/gen=2")

    val merged = SchemaEvolution.readMerged(spark, base)
    assert(merged.columns.toSet === Set("id", "name", "score", "gen"))
    assert(merged.count() === 3)
    assert(merged.filter(col("score").isNull).count() === 2) // old gen

    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("status", StringType)))
    val conformed = SchemaEvolution.conform(merged.drop("gen"), target,
      defaults = Map("status" -> "active"))
    assert(conformed.schema.fieldNames.toSeq ===
           Seq("id", "name", "score", "status"))
    assert(conformed.filter(col("status") === "active").count() === 3)
  }
}
