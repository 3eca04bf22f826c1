package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation: two-phase salted rollup.
  *
  * When a group key is heavily skewed (one hot key ≫ executor memory),
  * a plain groupBy funnels the hot key into one task. `saltedAgg`
  * aggregates on (key, salt) first — spreading the hot key over
  * `saltBuckets` tasks — then re-aggregates on the key. Correct for any
  * decomposable aggregate (count/sum/min/max); AQE's skew-join handling
  * covers joins, this covers aggregation.
  */
object Skew {

  /** count + sum(valueCol) per key, salted into `saltBuckets` partials. */
  def saltedCountSum(df: DataFrame, key: Column, valueCol: Column,
                     saltBuckets: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(),
                                lit(saltBuckets)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(valueCol).as("_s"))
      .groupBy(col("key"))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("total"))
}
