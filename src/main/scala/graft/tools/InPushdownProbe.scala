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
  * AT-or-under the threshold the pushed IN is a left-nested recursive
  * Or tree, depth = literal count, and past ~2k literals it overflows
  * the task stack (the round-13 1B-rung failure — GraftSession.
  * InScanChunk documents the bound), so the probe's third arm measures
  * the SHIPPED serve shape: the chunked union-of-scans
  * (IndexMaintainStream.literalInScan) under the shipped threshold.
  *
  * Usage: {{{ runMain graft.tools.InPushdownProbe [rows] [nIn] [cpus] }}}
  * Builds a key-clustered long table, times `isin(nIn uniform keys)`
  * count median-of-5 under three arms — threshold 10 (Spark default →
  * range degradation), a single pushed IN at the shipped threshold
  * (skipped when nIn exceeds it), and the chunked scan — printing one
  * JSON line per arm. */
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

    def time(arm: String, threshold: Int)
            (plan: => org.apache.spark.sql.DataFrame): Double = {
      spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold",
        threshold.toString)
      val t = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        plan.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(2)
      println(f"""{"tool":"in_pushdown_probe","arm":"$arm","rows":$rows,""" +
        f""""n_in":$nIn,"threshold":$threshold,"median_secs":$t%.3f}""")
      t
    }
    def state = spark.read.parquet(s"$dir/t")
    val shipped = graft.GraftSession.InFilterThreshold
    val lo = time("range_degraded", 10)(state.filter(col("k").isin(probes: _*)))
    val hi =
      if (nIn <= shipped)
        time("single_pushed_in", shipped)(
          state.filter(col("k").isin(probes: _*)))
      else Double.NaN // above the shipped threshold it IS the range arm
    val chunked = time("chunked_scans", shipped)(
      graft.streaming.IndexMaintainStream.literalInScan(state, "k", probes))
    val single = if (hi.isNaN) "null" else f"${lo / hi}%.2f"
    println(f"""{"tool":"in_pushdown_probe","rows":$rows,"n_in":$nIn,""" +
      f""""speedup_single":$single,""" +
      f""""speedup_chunked":${lo / chunked}%.2f}""")
    spark.stop()
  }
}
