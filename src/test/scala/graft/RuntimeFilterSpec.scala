package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning, demonstrated: at 100 TB the
  * canonical "big fact ⋈ selectively-filtered dim" query should not
  * scan-and-shuffle fact rows that can never match. Spark's runtime
  * row-level filtering (SPARK-32268) builds a bloom filter over the
  * dim side's join keys at execution time and injects a
  * `BloomFilterMightContain` predicate into the fact scan — the
  * engine-native generalization of the partition-pruning/semi-join
  * tricks warehouses hand-roll. This spec pins that the optimizer
  * knobs actually inject the filter on our star-join shape, and that
  * the filtered join is row-identical to the plain answer. */
class RuntimeFilterSpec extends AnyFunSuite {
  import TestSpark._

  test("bloom filter is injected into the fact side of a filtered dim join") {
    val prior = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // the dim side qualifies as a creation side at toy sizes...
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      // ...and the fact scan qualifies as worth filtering
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      // no broadcast: a broadcast join already prunes via the hash
      // relation, so runtime filtering targets shuffle joins
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val fact = Tables.lineitem(spark, Sf)
        .select(col("l_orderkey"), col("l_quantity"))
      val dim = Tables.orders(spark, Sf)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
             optimized.contains("BloomFilterMightContain") ||
             optimized.contains("might_contain"),
        s"no runtime bloom filter in the optimized plan:\n${optimized.take(3000)}")

      // row-identity with the un-tuned plain join
      val n = joined.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey")).count()
      assert(n === plain && n > 0)
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
