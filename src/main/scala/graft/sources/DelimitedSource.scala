package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Pipe-delimited extract ingestion with the reference's file semantics.
  *
  * The reference reads `|`-separated text extracts with quote handling,
  * a fixed null vocabulary, all-columns-as-string parsing, and
  * table-name/date extraction from the filename
  * (/root/reference/core/etl_service.py:635-657 `_read_file`,
  * :264-362 `_extract_table_name` / `_extract_file_date`). Re-expressed
  * on Spark's csv source so the scan is distributed, splittable, and
  * schema-pruned like any other relation.
  *
  * Scale notes: one file maps to many splits (csv is splittable when
  * uncompressed); `read` never infers schema on the cluster (explicit or
  * all-string, as the reference does) so ingestion cost is one pass.
  */
object DelimitedSource {

  /** The reference's null vocabulary (etl_service.py:647). */
  val NullValues: Seq[String] = Seq("", "NULL", "null", "None")

  /** Read a pipe-delimited extract; all columns string unless a schema
    * is given (the reference types later, during load). */
  def read(spark: SparkSession, path: String,
           schema: Option[StructType] = None): DataFrame = {
    val base = spark.read
      .option("sep", "|")
      .option("quote", "\"")
      // RFC-4180 doubled-quote escaping ("" -> ") — the reference's
      // pandas reader doubles quotes (doublequote=True default); Spark's
      // default escape is backslash, which would pass `""` through raw.
      .option("escape", "\"")
      .option("header", "true")
      .option("nullValue", "NULL")
      .option("mode", "PERMISSIVE")
    val df = schema match {
      case Some(s) => base.schema(s).csv(path)
      case None    => base.option("inferSchema", "false").csv(path)
    }
    // Normalize the full null vocabulary (csv option takes one token).
    df.select(df.columns.toIndexedSeq.map { c =>
      when(trim(col(c)).isin(NullValues: _*), lit(null))
        .otherwise(col(c)).as(c)
    }: _*)
  }

  /** Read with corrupt-record capture: malformed lines land in a
    * `_corrupt_record` column instead of failing the job or silently
    * dropping — the distributed form of the reference's per-row issue
    * logging (data_quality_issues). Requires an explicit schema (the
    * corrupt column must be declared). */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    spark.read
      .option("sep", "|")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
  }

  /** Write a frame as a pipe-delimited extract (round-trip support). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("sep", "|")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("header", "true")
      .csv(path)

  /** Table name from an extract filename, per the reference's rules:
    * strip recognized extensions, skip ignored prefixes, stop at a
    * YYYYMMDD segment (etl_service.py:264-335). */
  def tableNameOf(filename: String,
                  ignoredPrefixes: Set[String] = Set("SAMPLE", "CHHSCA"),
                  extensions: Seq[String] = Seq(".txt", ".csv")): String = {
    val base = extensions.foldLeft(filename)((n, e) => n.stripSuffix(e))
    val parts = base.split('_').toSeq
      .dropWhile(p => ignoredPrefixes.contains(p.toUpperCase))
      .takeWhile(p => !(p.length == 8 && p.forall(_.isDigit)))
    if (parts.isEmpty) "unknown_table" else parts.mkString("_")
  }

  /** File date (YYYYMMDD) from a filename, if present and valid. */
  def fileDateOf(filename: String): Option[String] =
    filename.split('.').head.split('_')
      .find(p => p.length == 8 && p.forall(_.isDigit))
      .filter { p =>
        val (y, m, d) = (p.take(4).toInt, p.slice(4, 6).toInt, p.drop(6).toInt)
        y >= 1900 && m >= 1 && m <= 12 && d >= 1 && d <= 31
      }
}
