package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal reproduction harness for the BloomFilterAggregate conf-clamp
  * behavior: builds a filter with numBits above the 64 Mbit default cap
  * through (a) a GLOBAL aggregate and (b) a GROUPED aggregate, with the
  * session caps raised first, and prints each serialized size — the
  * sharded-sidecar 300M rung produced exactly-64 Mbit shards (clamped)
  * while the global-agg 100M sidecar honored the raised cap. */
object BloomClampProbe {
  def main(args: Array[String]): Unit = {
    val bits = if (args.length > 0) args(0).toLong else 200000000L
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Registry.register(spark)
    val est = bits / 10
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
      est.toString)
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
      bits.toString)
    val src = spark.range(100000).select(xxhash64(col("id")).as("k"),
      pmod(col("id"), lit(2L)).cast("int").as("shard"))
    val g = src.agg(call_function("graft_bloom_agg", col("k"),
      lit(est), lit(bits))).head()
    println(s"PROBE global_bytes=${g.getAs[Array[Byte]](0).length} " +
      s"expect~${bits / 8}")
    src.groupBy(col("shard")).agg(call_function("graft_bloom_agg",
        col("k"), lit(est), lit(bits)).as("f"))
      .collect().foreach { r =>
        println(s"PROBE grouped shard=${r.getInt(0)} " +
          s"bytes=${r.getAs[Array[Byte]](1).length}")
      }
    spark.stop()
  }
}
