package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-lines ingestion with the same quarantine discipline as the
  * delimited source — the other wire format an event/export feed
  * arrives in (the reference stores JSON props inline in its activity
  * rows; the `events.props` column here is exactly that shape).
  *
  * Semantics mirror DelimitedSource: explicit schema only (never
  * cluster-side inference — a schema-inference pass over 100 TB is a
  * full extra scan), PERMISSIVE parse with malformed lines captured in
  * `_corrupt_record` instead of failing the job or silently dropping,
  * and a helper to split the good rows from the quarantine stream.
  * JSON-lines files are splittable, so one file still maps to many
  * input splits.
  */
object JsonLinesSource {

  /** Read JSON-lines with corrupt-record capture. The declared schema
    * drives column pruning in the parser itself (Jackson skips
    * undeclared fields), so a narrow read stays narrow. */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .json(path)
  }

  /** (good rows, quarantined raw lines) — the load/quarantine split the
    * reference's data_quality_issues log models per-row.
    *
    * The parsed frame is cache()'d here: Spark disallows querying only
    * `_corrupt_record` from a raw JSON scan
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and
    * caching also means the ingest parses each line once for both the
    * load branch and the quarantine branch. After materializing both
    * sides, call `parsed.unpersist()` (on the SAME frame passed in) to
    * release the storage memory — a long-lived ingest session that
    * skips this pins every batch's parse in the cache. */
  def splitQuarantine(parsed: DataFrame): (DataFrame, DataFrame) = {
    val cached = parsed.cache()
    val good = cached.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val bad = cached.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (good, bad)
  }

  /** Write a frame as JSON-lines (round-trip support). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
