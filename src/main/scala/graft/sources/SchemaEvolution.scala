package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-evolution support — the reference migrates its store with
  * explicit ALTERs (/root/reference/migrate_db.py,
  * core/database_schema_converter.py); a parquet lake evolves instead by
  * merging file schemas on read and backfilling defaults, so old and new
  * data generations stay queryable together without rewriting history.
  */
object SchemaEvolution {

  /** Read a table whose files span schema generations: union of all
    * file schemas (mergeSchema), missing columns null. */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Conform a frame to a target schema: add missing columns with
    * defaults (or null), drop extras, align order — the "migration"
    * applied lazily at read time instead of rewriting stored data. */
  def conform(df: DataFrame, target: StructType,
              defaults: Map[String, Any] = Map.empty): DataFrame = {
    val present = df.columns.toSet
    val cols = target.fields.toIndexedSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else defaults.get(f.name) match {
        case Some(v) => lit(v).cast(f.dataType).as(f.name)
        case None    => lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols: _*)
  }
}
