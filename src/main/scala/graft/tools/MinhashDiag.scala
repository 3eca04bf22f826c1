package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the minhash-LSH pair space (§6.5 superlinearity
  * adjudication): band-bucket occupancy histogram + the implied
  * all-pairs volume at each ladder rung. Usage:
  * {{{ runMain graft.tools.MinhashDiag <sfDir> [cpus] }}} */
object MinhashDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Registry.register(spark)
    val P = graft.functions.expressions.MinHashFamily.P
    val docs = graft.Tables.documents(spark, dir)
    // same band construction as Dedup.minhashPairs
    val hashed = graft.functions.TextFunctions
      .shingleRows(docs, distinct = false)
      .withColumn("h", pmod(xxhash64(col("shingle")), lit(P)))
    val sigs = hashed.groupBy(col("doc_id"))
      .agg(call_function("graft_minhash_sig", col("h")).as("sig"))
    val bands = sigs.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(3)),
        j => struct(j.as("band_idx"),
          xxhash64(slice(col("sig"), j * 4 + 1, lit(4))).as("band_hash"))))
        .as("band"))
      .select(col("band.band_idx"), col("band.band_hash"))
    val occ = bands.groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("n"))
    val stats = occ.agg(
      count(lit(1)).as("n_buckets"),
      sum(when(col("n") >= 2, 1L).otherwise(0L)).as("n_multi"),
      sum(when(col("n") > 4096, 1L).otherwise(0L)).as("n_hot"),
      max(col("n")).as("max_n"),
      sum(when(col("n") <= 4096, col("n") * (col("n") - 1) / 2)
        .otherwise(col("n"))).as("pair_volume")).collect().head
    val nDocs = docs.count()
    println(s"""{"tool":"minhash_diag","sf":"$dir","n_docs":$nDocs,""" +
      s""""n_buckets":${stats.getAs[Long]("n_buckets")},""" +
      s""""n_multi":${stats.getAs[Long]("n_multi")},""" +
      s""""n_hot":${stats.getAs[Long]("n_hot")},""" +
      s""""max_n":${stats.getAs[Long]("max_n")},""" +
      s""""pair_volume":${stats.getAs[Long]("pair_volume")}}""")

    // stage timing: force each prefix of the pipeline independently
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      println(f"""{"stage":"$name","secs":${(System.nanoTime()-t0)/1e9}%.2f}""")
    }
    time("shingles_hashed")(hashed)
    time("signatures")(sigs)
    time("bands")(bands)
    time("bucket_occupancy")(occ)
    time("full_pairs")(graft.dedup.Dedup.minhashPairs(spark, docs))
    spark.stop()
  }
}
