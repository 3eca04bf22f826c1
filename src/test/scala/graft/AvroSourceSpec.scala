package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroSource

/** Avro parity without the spark-avro connector: container files written
  * by a FOREIGN producer (plain avro-core DataFileWriter, as a Kafka
  * archiver would) must read into typed frames, and Spark frames must
  * round-trip through the distributed writer losslessly. */
class AvroSourceSpec extends AnyFunSuite {
  import TestSpark._

  private val fixtureSchema = new Schema.Parser().parse(
    """{"type":"record","name":"doc","fields":[
      |{"name":"doc_id","type":"long"},
      |{"name":"title","type":["null","string"],"default":null},
      |{"name":"score","type":"double"},
      |{"name":"tags","type":{"type":"array","items":"string"}},
      |{"name":"vec","type":{"type":"array","items":"float"}},
      |{"name":"payload","type":["null","bytes"],"default":null}
      |]}""".stripMargin)

  private def writeFixture(path: java.io.File, n: Int): Unit = {
    val writer = new DataFileWriter(
      new GenericDatumWriter[GenericRecord](fixtureSchema))
    writer.create(fixtureSchema, path)
    (0 until n).foreach { i =>
      val r = new GenericData.Record(fixtureSchema)
      r.put("doc_id", i.toLong)
      r.put("title", if (i % 5 == 0) null else s"doc-$i")
      r.put("score", i * 0.25)
      r.put("tags", Seq(s"t${i % 3}", "all").asJava)
      r.put("vec", Seq(Float.box(i * 1.0f), Float.box(i * 2.0f)).asJava)
      r.put("payload",
        if (i % 2 == 0) java.nio.ByteBuffer.wrap(Array[Byte](i.toByte, 7)) else null)
      writer.append(r)
    }
    writer.close()
  }

  test("reads foreign-written container files with schema, nulls, arrays, bytes") {
    val dir = Files.createTempDirectory("avro_read").toFile
    writeFixture(new java.io.File(dir, "part-0.avro"), 20)
    writeFixture(new java.io.File(dir, "part-1.avro"), 20)
    val df = AvroSource.read(spark, dir.getPath)
    assert(df.schema.fieldNames.toSeq ===
      Seq("doc_id", "title", "score", "tags", "vec", "payload"))
    assert(df.schema("title").nullable)
    assert(df.schema("vec").dataType === ArrayType(FloatType, containsNull = false))
    assert(df.count() === 40)
    val r4 = df.filter(col("doc_id") === 4).collect().head
    assert(r4.getAs[String]("title") === "doc-4")
    assert(r4.getAs[Double]("score") === 1.0)
    assert(r4.getAs[Seq[String]]("tags") === Seq("t1", "all"))
    assert(r4.getAs[Seq[Float]]("vec") === Seq(4.0f, 8.0f))
    assert(r4.getAs[Array[Byte]]("payload").toSeq === Seq(4.toByte, 7.toByte))
    val r0 = df.filter(col("doc_id") === 0).collect().head
    assert(r0.isNullAt(r0.fieldIndex("title")))
    // both files' rows arrive (the 20 ids appear twice)
    assert(df.groupBy("doc_id").count().filter(col("count") =!= 2).count() === 0)
  }

  test("distributed write round-trips a typed frame losslessly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("avro_rt").toFile
    val out = new java.io.File(dir, "out").getPath
    val df = spark.range(100).select(
      col("id"),
      concat(lit("name-"), col("id")).as("name"),
      (col("id") * 0.5).as("score"),
      when(col("id") % 10 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("d"), col("id") % 4)).as("domain"),
      array((col("id") * 2).cast("float"), lit(1.5f)).as("vec"),
      to_timestamp(lit("2026-03-01 12:34:56.789")).as("ts"),
      to_date(lit("2026-03-02")).as("day"))
      .repartition(3)
    AvroSource.write(df, out)
    val back = AvroSource.read(spark, out)
    assert(back.count() === 100)
    // multiple part files -> the write was map-only per partition
    assert(new java.io.File(out).listFiles()
      .count(f => f.getName.startsWith("part-")) === 3)
    val a = df.orderBy("id").collect()
    val b = back.orderBy("id").collect()
    a.zip(b).foreach { case (x, y) =>
      assert(x.getSeq[Float](x.fieldIndex("vec")) === y.getSeq[Float](y.fieldIndex("vec")))
      assert(x.getAs[java.sql.Timestamp]("ts") === y.getAs[java.sql.Timestamp]("ts"))
      assert(x.getAs[java.sql.Date]("day") === y.getAs[java.sql.Date]("day"))
      assert(x.getAs[String]("domain") === y.getAs[String]("domain"))
    }
  }

  test("documents table survives parquet -> avro -> parquet onboarding") {
    val docs = Tables.documents(spark, Sf)
      .select("doc_id", "source", "lang", "text", "n_chars")
    val dir = Files.createTempDirectory("avro_onb").toFile
    val avroPath = new java.io.File(dir, "avro").getPath
    val pqPath = new java.io.File(dir, "pq").getPath
    AvroSource.write(docs, avroPath)
    AvroSource.toParquet(spark, avroPath, pqPath)
    val back = spark.read.parquet(pqPath)
    assert(back.schema === docs.schema)
    assert(back.count() === docs.count())
    // value-level: anti-join both ways is empty
    assert(back.exceptAll(docs).count() === 0)
    assert(docs.exceptAll(back).count() === 0)
  }

  test("nested records and maps map both directions") {
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("k", StringType),
        StructField("n", IntegerType))), nullable = true),
      StructField("attrs", MapType(StringType, DoubleType), nullable = true)))
    val rows = Seq(
      Row(1L, Row("a", 10), Map("x" -> 1.5, "y" -> 2.5)),
      Row(2L, null, Map.empty[String, Double]),
      Row(3L, Row(null, 30), null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), st)
    val dir = Files.createTempDirectory("avro_nested").toFile
    val out = new java.io.File(dir, "out").getPath
    AvroSource.write(df, out)
    val back = AvroSource.read(spark, out).orderBy("id").collect()
    assert(back(0).getStruct(1).getString(0) === "a")
    assert(back(0).getAs[Map[String, Double]]("attrs") === Map("x" -> 1.5, "y" -> 2.5))
    assert(back(1).isNullAt(1))
    assert(back(2).getStruct(1).isNullAt(0))
    assert(back(2).isNullAt(2))
  }
}
