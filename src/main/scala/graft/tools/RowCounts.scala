package graft.tools

import org.apache.spark.sql.SparkSession

/** Scaling-audit helper: prints output row counts for the pair-driven
  * queries at two scale dirs, to separate "runtime grew because the
  * OUTPUT grew" (linear-in-output, optimal) from true superlinearity.
  * Usage: runMain graft.tools.RowCounts dirA dirB */
object RowCounts {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.length >= 2) Seq(args(0), args(1))
               else Seq("/root/testdata/sf0.1", "/root/repo/.scratch/sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("dedup_ngram_jaccard", "dedup_simhash", "dedup_clusters",
      "dedup_canonical", "sample_soft_dedup", "etl_entity_match",
      "dedup_minhash_lsh")
    for (sf <- dirs; n <- names) {
      val c = graft.SparkEntry.queries(n)(spark, sf).count()
      println(s"ROWS $sf $n $c")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
