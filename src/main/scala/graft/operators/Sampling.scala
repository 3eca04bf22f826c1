package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic sampling & dataset splitting.
  *
  * A reproducible training pipeline can't use `rand()`-based sampling —
  * re-runs must select the same rows on any cluster layout. Selection
  * here keys off md5 of the stable id (content-addressed, identical in
  * every engine), so samples and train/val/test splits are pure
  * functions of the data. Both ops are map-only (predicate/projection
  * on the scan, no shuffle).
  */
object Sampling {

  /** First hex nibble of md5(id) as 0..15 — the deterministic "coin". */
  private def bucket16(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 1), 16, 10).cast("int")

  /** ~25% deterministic sample per language (stratification key kept in
    * the output so downstream can verify per-stratum rates). */
  def sampleDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(bucket16(col("doc_id")) < 4)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Deterministic 80/10/10 train/val/test assignment. */
  def splitDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("b", bucket16(col("doc_id")))
      .withColumn("split",
        when(col("b") < 13, "train")       // 13/16 ≈ 81%
          .when(col("b") < 14, "val")      // 1/16
          .otherwise("test"))              // 2/16
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("split"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_deterministic" -> (sampleDocs _),
    "split_train_test"     -> (splitDocs _))

  val oracles: Map[String, String] = Map(
    "sample_deterministic" ->
      """SELECT doc_id, lang, n_chars FROM documents
         WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                    AS INTEGER) < 4
         ORDER BY doc_id""",
    "split_train_test" ->
      """WITH b AS (
           SELECT lang,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                       AS INTEGER) AS bk
           FROM documents)
         SELECT CASE WHEN bk < 13 THEN 'train'
                     WHEN bk < 14 THEN 'val'
                     ELSE 'test' END AS split,
                count(*) AS n_docs,
                count(DISTINCT lang) AS n_langs
         FROM b GROUP BY 1 ORDER BY split""")
}
