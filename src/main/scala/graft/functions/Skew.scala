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

  /** Salted equi-join for a hot-keyed fact against a small-ish dim:
    * every fact row picks a pseudo-random salt in [0, saltBuckets) and
    * the dim replicates across ALL salts, so a hot key's rows spread
    * over `saltBuckets` tasks instead of funneling into one. Result is
    * row-identical to `fact.join(dim, key)` (inner). AQE's skew-join
    * split handles sort-merge spills adaptively; explicit salting is
    * the deterministic fallback when one key exceeds what a single
    * task can hold even post-split, at the cost of a `saltBuckets`×
    * dim replication. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltedJoin: saltBuckets must be positive")
    val sf = fact.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
           lit(saltBuckets.toLong)).cast("int"))
    val sd = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    sf.join(sd, Seq(key, "_salt")).drop("_salt")
  }
}
