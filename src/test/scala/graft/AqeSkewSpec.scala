package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling, demonstrated: at 100 TB the first line of
  * defense against a hot join key is AQE's OptimizeSkewedJoin (split
  * the oversized partition, replicate the other side), with manual
  * salting (functions.Skew) as the fallback where AQE can't see the
  * skew. This spec pins that the cluster-tuning knobs actually engage
  * on a skewed shape — and that the skew-handled join is row-identical
  * to the plain answer. */
class AqeSkewSpec extends AnyFunSuite {
  import TestSpark._

  test("AQE splits a skewed sort-merge join partition (skew=true)") {
    import spark.implicits._
    val prior = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      // no broadcast: force the shuffle join AQE has to repair
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // make the hot partition count as skewed at toy sizes
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // one hot key carrying ~97% of the fact rows
      val fact = spark.range(30000)
        .select(when(col("id") % 30 === 0, col("id")).otherwise(lit(7L))
                  .as("k"),
                col("id").as("payload"))
      val dim = (0L until 30000L by 30L).toDF("k")
        .union(Seq(7L).toDF("k"))
        .withColumn("tag", concat(lit("dim_"), col("k")))
      val joined = fact.join(dim, "k")
      // drive THIS queryExecution (count() would build its own) so the
      // adaptive plan is final when inspected
      val qe = joined.queryExecution
      val n = qe.toRdd.count()
      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${finalPlan.take(3000)}")
      // row-identity with the plain (non-AQE-tuned) answer
      assert(n === 30000L)
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
