package graft.functions

import org.apache.spark.sql.SparkSession

import graft.functions.expressions.{BloomFileMightContain, BoundedBucket, DeflateLength, DotProduct, FreqItemsSketch, HyperplaneBands, MinHashSignature, SimHashSignature, UnicodeNormalize}

/** Per-session registration of graft's native Catalyst expressions.
  * Idempotent; the function registry is the supported route to custom
  * expressions (the public Column API has no expression constructor). */
object Registry {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_minhash_sig", exprs => MinHashSignature(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_hplane_bands", HyperplaneBands.build, "built-in")
    reg.createOrReplaceTempFunction(
      "graft_simhash", exprs => SimHashSignature(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_freq_items", FreqItemsSketch.build, "built-in")
    reg.createOrReplaceTempFunction(
      "graft_bounded_bucket", BoundedBucket.build, "built-in")
    reg.createOrReplaceTempFunction(
      "graft_deflate_len", exprs => DeflateLength(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_normalize", { exprs =>
        val form = if (exprs.length < 2) "NFC" else exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(s, _)
              if s != null => s.toString
          case _ => throw new IllegalArgumentException(
            "graft_normalize form must be a string literal")
        }
        UnicodeNormalize(exprs.head, form)
      }, "built-in")
    // Spark's own bloom-filter pair (the expressions behind runtime
    // row-level filtering, SPARK-32268) exposed under graft names —
    // they are not in the public FunctionRegistry. The aggregate is
    // MERGEABLE (map-side partial combine), which is what makes a
    // persistent dedup membership index maintainable incrementally.
    reg.createOrReplaceTempFunction(
      "graft_bloom_agg", { exprs =>
        if (exprs.length != 3) throw new IllegalArgumentException(
          s"graft_bloom_agg expects (xxhash64 value, est_items, num_bits), " +
          s"got ${exprs.length} arguments")
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
      }, "built-in")
    reg.createOrReplaceTempFunction(
      "graft_might_contain", { exprs =>
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"graft_might_contain expects (bloom, xxhash64 value), " +
          s"got ${exprs.length} arguments")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1))
      }, "built-in")
    reg.createOrReplaceTempFunction(
      "graft_bloom_probe", { exprs =>
        if (exprs.length != 3) throw new IllegalArgumentException(
          s"graft_bloom_probe expects (sidecar dir, shards, xxhash64 " +
          s"value), got ${exprs.length} arguments")
        BloomFileMightContain(exprs(0), exprs(1), exprs(2))
      }, "built-in")
  }
}
