package graft

import org.apache.spark.sql.SparkSession

/** Benchmark protocol (defensible by construction):
  *  - queries run in sorted-name order, so rounds are order-comparable
  *    even as entries are added;
  *  - each query runs `SPARK_GRAFT_BENCH_RUNS` times (default 3) and the
  *    MEDIAN is reported, so one noisy-neighbor run can't poison a
  *    round-over-round comparison;
  *  - timing materializes `queryExecution.toRdd.count()` — every output
  *    row of the real physical plan; `df.count()` would let Catalyst
  *    prune the projections being measured;
  *  - queries are isolated: after each query the harness unpersists any
  *    leftover persistent RDD blocks (the lazy localCheckpoints several
  *    operators pin). Without this, blocks accumulate across the 100+
  *    query session and squeeze the execution memory of whichever query
  *    runs later — a 1.2 s query was observed at 17 s purely from
  *    stale-block GC pressure.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-reader paths once so the first timed
    // query doesn't carry session bring-up cost.
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(1).collect()
    Tables.events(spark, sfDir).limit(1).collect()
    // optional comma-separated allowlist for local iteration
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).queryExecution.toRdd.count() }
        catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        // free this run's checkpoint blocks before the next run/query
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        dt
      }.sorted
      name -> times(times.size / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs_per_query":$runs,"stat":"median"}""")
    spark.stop()
  }
}
