package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the one conf that decides whether a literal-IN serve over
  * a key-clustered table actually PRUNES row groups:
  * `spark.sql.parquet.pushdown.inFilterThreshold` (default 10). Above
  * the threshold Spark degrades the pushed filter to a min/max RANGE
  * over the IN values — for uniformly-distributed keys (hashes, gram
  * keys, xxhash64 terms: every standing index this library serves)
  * that range spans the whole keyspace and prunes NOTHING, so the
  * serve silently reads every row group and filters row-by-row. With
  * the values pushed as a real parquet In predicate, a clustered
  * table's tight per-row-group min/max skips every group containing
  * no probed key — the skipping the clustered layout exists to enable.
  *
  * Usage: {{{ runMain graft.tools.InPushdownProbe [rows] [nIn] [cpus] }}}
  * Builds a key-clustered long table, times `isin(nIn uniform keys)`
  * count under threshold 10 (Spark default) vs 10000 (the verify
  * path's InPushdownCap), median-of-5 each, prints one JSON line per
  * arm. */
object InPushdownProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 200000000L
    val nIn = if (args.length > 1) args(1).toInt else 1000
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("inprobe").toString
    // xxhash64 keys — uniform, the standing-index wire form
    val files = math.max(cpus.toInt, (rows / 4000000L).toInt)
    graft.sinks.LakeSink.writeClustered(
      spark.range(rows).select(xxhash64(col("id")).as("k")),
      s"$dir/t", files, col("k"))
    val probes: Seq[Any] = (0L until nIn.toLong)
      .map(i => xxhash64(lit(s"probe$i")))
      .map(c => spark.range(1).select(c).head.getLong(0): Any)

    def timeArm(threshold: Int): Double = {
      spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold",
        threshold.toString)
      val t = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        spark.read.parquet(s"$dir/t").filter(col("k").isin(probes: _*))
          .queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(2)
      println(f"""{"tool":"in_pushdown_probe","rows":$rows,"n_in":$nIn,""" +
        f""""threshold":$threshold,"median_secs":$t%.3f}""")
      t
    }
    val lo = timeArm(10)
    val hi = timeArm(10000)
    println(f"""{"tool":"in_pushdown_probe","rows":$rows,"n_in":$nIn,""" +
      f""""speedup":${lo / hi}%.2f}""")
    spark.stop()
  }
}
