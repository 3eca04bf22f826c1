package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{IndexMaintainStream, PretrainStream}

/** Stage-level timing of one PretrainStream pregated epoch against a
  * seeded root — the MinhashDiag discipline: when a ladder reading
  * disagrees with the cost model, measure the pieces, don't guess.
  * Seeds `seedKeys` hashes (clustered or not), then times, separately:
  * the raw-hash probe query, the positives verify scan, the epoch
  * bloom build, and the full processBatch for BOTH arms.
  *
  * Usage: {{{ runMain graft.tools.PregateDiag [seedKeys] [clustered] [cpus] }}}
  */
object PregateDiag {
  def main(args: Array[String]): Unit = {
    val seedKeys = if (args.length > 0) args(0).toLong else 20000000L
    val clustered = if (args.length > 1) args(1).toBoolean else true
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.functions.Registry.register(spark)

    val root = java.nio.file.Files.createTempDirectory("pregatediag").toString
    IndexMaintainStream.commitBatch(spark, root, "batch=0") { staging =>
      val seeds = spark.range(seedKeys)
        .select(md5(concat(lit("seed"), col("id"))).as("norm_hash"))
      if (clustered)
        graft.sinks.LakeSink.writeClustered(seeds, s"$staging/hashes",
          cpus.toInt, col("norm_hash"))
      else seeds.write.parquet(s"$staging/hashes")
      spark.range(0).select(col("id").as("doc_id"), lit("en").as("lang"),
          lit(0L).as("n_words"), lit("").as("text"))
        .write.parquet(s"$staging/docs")
      IndexMaintainStream.writeBloomSidecar(spark, s"$staging/hashes",
        s"$staging/bloom", xxhash64(col("norm_hash")))
    }

    def batch(ep: Int) = {
      val base = ep.toLong * 50000L
      spark.range(base, base + 50000L)
        .select(col("id").as("doc_id"),
          when(col("id") % 100 === 0 && col("id") >= 50000L,
            col("id") - 50000L).otherwise(col("id")).as("content_id"))
        .select(col("doc_id"), lit("en").as("lang"),
          concat(array_join(transform(sequence(lit(0), lit(39)),
            j => concat(lit("x"), pmod(col("content_id") * 7 + j,
              lit(997)))), " "),
          lit(" u"), col("content_id"), lit(" the of and a")).as("text"))
        .localCheckpoint(true)
    }

    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"""{"tool":"pregate_diag","stage":"$name",""" +
        f""""secs":${(System.nanoTime() - t0) / 1e9}%.3f,""" +
        f""""seed":$seedKeys,"clustered":$clustered}""")
    }

    val b1 = batch(1)
    import graft.functions.TextFunctions.normText
    val raw = b1.select(md5(normText(col("text"))).as("norm_hash")).distinct()

    t("warmup_full_epoch1")(
      PretrainStream.processBatch(b1, spark.emptyDataset[Long]
        .toDF("train_doc_id"), root, 1L, pregateMinKeys = 0L))

    val b2 = batch(2) // carries 1% dups of epoch 1
    val contaminated = spark.emptyDataset[Long].toDF("train_doc_id")

    t("raw_hash_distinct_only")(raw.queryExecution.toRdd.count())
    val probe = IndexMaintainStream.bloomProbe(spark,
      Seq(s"$root/batch=0/bloom", s"$root/batch=1/bloom"),
      xxhash64(col("norm_hash"))).get
    var ph: Array[String] = Array.empty
    t("probe_query_cold") {
      ph = b2.select(md5(normText(col("text"))).as("norm_hash")).distinct()
        .filter(probe).limit(10001).collect().map(_.getString(0))
    }
    t("probe_query_warm") {
      b2.select(md5(normText(col("text"))).as("norm_hash")).distinct()
        .filter(probe).limit(10001).collect()
    }
    println(s"""{"tool":"pregate_diag","positives":${ph.length}}""")
    val state = spark.read.parquet(s"$root/batch=0/hashes",
      s"$root/batch=1/hashes")
    t("verify_in_scan")(
      state.filter(col("norm_hash").isin(ph.toSeq: _*))
        .queryExecution.toRdd.count())
    t("bloom_build_50k") {
      val tmp = java.nio.file.Files
        .createTempDirectory("pregatediagbloom").toString
      raw.write.parquet(s"$tmp/h")
      IndexMaintainStream.writeBloomSidecar(spark, s"$tmp/h", s"$tmp/b",
        xxhash64(col("norm_hash")))
    }
    t("full_epoch2_pregate")(
      PretrainStream.processBatch(b2, contaminated, root, 2L,
        pregateMinKeys = 0L))
    t("full_epoch3_naive")(
      PretrainStream.processBatch(batch(3), contaminated, root, 3L,
        pregate = false))
    t("full_epoch4_pregate")(
      PretrainStream.processBatch(batch(4), contaminated, root, 4L,
        pregateMinKeys = 0L))
    spark.stop()
  }
}
