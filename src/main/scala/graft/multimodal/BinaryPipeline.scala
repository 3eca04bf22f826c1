package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  *
  * The container has no image/audio codecs, so per SURVEY §2.9 the
  * *decode* step is a clearly-marked deterministic stub — but everything
  * Spark-side is real and tested: binary column handling, metadata
  * extraction with pushdown-friendly typed columns, and batched
  * per-partition feature extraction (the Scala analogue of a batched
  * `mapInPandas` decode: fixed-size batches through an opaque kernel).
  *
  * Scale notes: payloads never leave columnar storage until the feature
  * stage; metadata (size/hash/chunk) is map-only and gives downstream
  * stages partition-pruning handles; the feature kernel processes
  * fixed-size batches so decoder memory stays bounded per task.
  */
object BinaryPipeline {

  /** Typed metadata over a binary payload column (oracle-checked). */
  def meta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      md5(col("text")).as("content_hash"),
      (col("doc_id") / 100).cast("long").as("chunk_id"),
      lit("text/plain").as("mime"))

  case class Payload(doc_id: Long, payload: Array[Byte])
  case class Features(doc_id: Long, n_bytes: Long,
                      f0: Double, f1: Double, f2: Double, f3: Double)

  /** Batched feature extraction over the binary column.
    *
    * The decode kernel below is a STUB: a real deployment swaps
    * `fakeDecode` for an image/audio library call; the batching shape,
    * schema, and partitioning are the real, tested plumbing.
    */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[Payload]
    payloads.mapPartitions { it =>
      it.grouped(64).flatMap { batch => // bounded decoder batches
        batch.iterator.map { p =>
          val bytes = p.payload
          fakeDecode(p.doc_id, bytes)
        }
      }
    }.toDF()
  }

  /** STUB decode — deterministic fake features standing in for a codec. */
  private def fakeDecode(docId: Long, bytes: Array[Byte]): Features = {
    val n = bytes.length.toLong
    val first = if (bytes.nonEmpty) (bytes(0) & 0xFF).toDouble else 0.0
    val checksum = bytes.foldLeft(0L)((a, b) => (a + (b & 0xFF)) % 997).toDouble
    Features(docId, n, n.toDouble, first, checksum, (n % 251).toDouble)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta"     -> (meta _),
    "multimodal_features" -> (features _))

  val oracles: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
                CAST(strlen(text) AS BIGINT) AS n_bytes,
                md5(text) AS content_hash,
                CAST(doc_id // 100 AS BIGINT) AS chunk_id,
                'text/plain' AS mime
         FROM documents""")
}
