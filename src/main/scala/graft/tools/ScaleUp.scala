package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-audit data generator: replicates the sf0.1 testdata N× with
  * disjoint key ranges so the bench can run at ~sf1 without touching
  * the read-only driver data. Facts replicate with per-replica key
  * offsets (keys stay unique and foreign keys stay consistent); the
  * fixed-size dimensions (region, nation) copy as-is; the
  * SF-proportional dimensions (customer, supplier, part) replicate
  * with offsets and their fact references follow, so per-entity
  * cardinalities (orders per customer, lines per supplier) stay
  * constant under scale-up — the audit measures DATA growth, not
  * artificial per-key skew growth.
  *
  * Document text and embedding vectors are NOT perturbed: replicas are
  * exact duplicates, which turns the ~sf1 corpus into a mass-duplicate
  * stress (10-doc exact-dup groups, jaccard-1.0 clusters, saturated
  * LSH buckets) — deliberately exercising the hot-bucket guards and
  * star-expansion paths at their worst case, on top of the 10× volume.
  *
  * Usage: runMain graft.tools.ScaleUp [srcDir dstDir replicas]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/root/repo/.scratch/sf1"
    val replicas = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // read the raw int64 nanos of events.ts (see Tables.events); the
    // replica is written as a plain int64 column, which Tables.events
    // handles identically
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def rd(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def wr(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")

    // one stride per KEY DOMAIN, computed from the domain's owning
    // table (pow10 ceiling above its max key) so a foreign key gets
    // the SAME offset as the key it references
    def stride(table: String, key: String): Long = {
      val mx = rd(table).agg(max(col(key))).head.getLong(0)
      math.pow(10, math.ceil(math.log10((mx + 2).toDouble))).toLong
    }
    val custS  = stride("customer", "c_custkey")
    val suppS  = stride("supplier", "s_suppkey")
    val partS  = stride("part", "p_partkey")
    val orderS = stride("orders", "o_orderkey")
    val eventS = stride("events", "event_id")
    val userS  = stride("events", "user_id")
    val docS   = stride("documents", "doc_id")
    val vecS   = stride("embeddings", "vec_id")

    def replicate(df: DataFrame, keys: (String, Long)*): DataFrame =
      (0 until replicas).map { i =>
        keys.foldLeft(df) { case (d, (k, s)) =>
          d.withColumn(k, col(k) + lit(i * s))
        }
      }.reduce(_ unionByName _)

    Seq("region", "nation").foreach(t => wr(rd(t), t))
    wr(replicate(rd("customer"), "c_custkey" -> custS), "customer")
    wr(replicate(rd("supplier"), "s_suppkey" -> suppS), "supplier")
    wr(replicate(rd("part"), "p_partkey" -> partS), "part")
    wr(replicate(rd("orders"),
         "o_orderkey" -> orderS, "o_custkey" -> custS), "orders")
    wr(replicate(rd("lineitem"), "l_orderkey" -> orderS,
         "l_partkey" -> partS, "l_suppkey" -> suppS), "lineitem")
    wr(replicate(rd("events"),
         "event_id" -> eventS, "user_id" -> userS), "events")
    wr(replicate(rd("documents"), "doc_id" -> docS), "documents")
    wr(replicate(rd("embeddings"), "vec_id" -> vecS), "embeddings")
    println(s"[scaleup] wrote ${replicas}x $src -> $dst")
    spark.stop()
  }
}
