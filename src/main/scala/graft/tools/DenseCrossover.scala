package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dense-retrieval crossover at PRODUCTION dimensionality (round 8,
  * closing §6.3's extrapolation): the 64-dim ladder showed brute cosine
  * staying ahead of the served IVF-PQ index through 2M vectors because
  * 64-dim scans are memory-bandwidth trivia; the slope argument said
  * 768-dim (a typical text-embedding width) multiplies the brute cost
  * 12× while the indexed serve stays dimension-light (byte codes + one
  * LUT whose size is M×K, not dim). This tool MEASURES that: each
  * xover_r<N> corpus's embeddings are widened 64→768 by tiling twelve
  * deterministically drifted copies (sin-offset per tile, no RNG — the
  * same fresh-content discipline as ScaleUpFresh; tiles differ so the
  * four PQ subspaces see distinct structure), then brute top-k
  * (Knn.topK) and the persisted-index serve (Knn.ivfPqServe over
  * AnnIndex.ivfPqCached — dimension-generic since ivfPqFit infers the
  * width) are timed median-of-3 with builds and model loads untimed.
  *
  * Usage: runMain graft.tools.DenseCrossover [scratchDir rungs]
  * (requires CrossoverSweep's xover_r<N> dirs to exist for the rungs).
  */
object DenseCrossover {
  def main(args: Array[String]): Unit = {
    val scratch = if (args.length > 0) args(0) else "/root/repo/.scratch"
    val rungs =
      if (args.length > 1) args(1).split(",").toSeq.map(_.trim.toInt)
      else Seq(10, 100, 300, 1000)

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)

    // widen 64 -> 768: twelve tiles, tile r drifted by sin(7r + d)/8 —
    // matches ScaleUpFresh's embedding-drift convention
    rungs.foreach { r =>
      val src = s"$scratch/xover_r$r"
      val dst = s"$scratch/xover768_r$r"
      if (!new java.io.File(s"$dst/embeddings.parquet").exists()) {
        val wide = spark.read.parquet(s"$src/embeddings.parquet")
          .select(col("vec_id"),
            flatten(transform(sequence(lit(0), lit(11)),
              t => transform(col("embedding"),
                (x, d) => x + sin(t * 7 + d) / lit(8.0))))
              .cast("array<float>").as("embedding"))
        wide.repartition(32).write.mode("overwrite")
          .parquet(s"$dst/embeddings.parquet")
      }
    }

    def medianWall(f: => Unit): Double = {
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      t(1)
    }

    println("| replicas | n_vecs | dim | dense brute s | dense indexed s |")
    println("|---|---|---|---|---|")
    rungs.foreach { r =>
      val dir = s"$scratch/xover768_r$r"
      val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val (cbooks, coarse, codes) =
        graft.similarity.AnnIndex.ivfPqCached(spark, dir) // untimed build
      val e = graft.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      graft.similarity.Knn.topK(spark, dir).collect() // warm
      graft.similarity.Knn
        .ivfPqServe(spark, e, 10, 3, cbooks, coarse, codes).collect()
      val dBrute = medianWall(graft.similarity.Knn.topK(spark, dir).collect())
      val dIdx = medianWall(graft.similarity.Knn
        .ivfPqServe(spark, e, 10, 3, cbooks, coarse, codes).collect())
      println(f"| ${r}x | $nVecs | 768 | $dBrute%.2f | $dIdx%.2f |")
    }
    spark.stop()
  }
}
