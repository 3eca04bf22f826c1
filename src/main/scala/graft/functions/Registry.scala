package graft.functions

import org.apache.spark.sql.SparkSession

import graft.functions.expressions.{DeflateLength, DotProduct, FreqItemsSketch, HyperplaneBands, MinHashSignature, SimHashSignature}

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
      "graft_deflate_len", exprs => DeflateLength(exprs.head), "built-in")
  }
}
