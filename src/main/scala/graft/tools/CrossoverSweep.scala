package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Indexed-retrieval CROSSOVER sweep (round 8, verdict item 7): the
  * honest note on the rag_*_indexed entries says brute-force serving
  * beats index serving in ABSOLUTE wall at test SF (fixed index
  * overheads dominate tiny corpora) while the indexed path is the
  * structural winner at scale. This tool turns that plan argument into
  * a measured trend: serve-time wall for the brute vs the
  * index-served leg of BOTH retrieval modalities over a corpus-size
  * ladder of fresh-content replicas (ScaleUpFresh — disjoint
  * vocabulary / drifted vectors, so vocabulary and bucket cardinality
  * grow like a genuinely larger corpus, not like clones).
  *
  * Method per rung: generate (once, cached on disk), build the
  * persisted indexes UNTIMED (build is offline by design), then
  * median-of-3 wall for each serve:
  *   - dense brute    = similarity.Knn.topK (full-corpus cosine rank)
  *   - dense indexed  = Knn.ivfPqServe over the persisted cell-pruned
  *                      codes (model preloaded once, as a resident
  *                      server process would)
  *   - sparse brute   = operators.Search.bm25 (tokenize + aggregate
  *                      the corpus at query time)
  *   - sparse indexed = operators.SearchIndex.bm25Indexed (term-pruned
  *                      postings scan, no query-time tokenization)
  *
  * Usage: runMain graft.tools.CrossoverSweep [srcDir scratchDir rungs]
  * (rungs comma-separated, default "1,3,10,30,100").
  * Prints a markdown table for SURVEY §6. */
object CrossoverSweep {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val scratch = if (args.length > 1) args(1) else "/root/repo/.scratch"
    val rungs =
      if (args.length > 2) args(2).split(",").toSeq.map(_.trim.toInt)
      else Seq(1, 3, 10, 30, 100)

    // generate the ladder first (ScaleUpFresh manages its own session),
    // then NORMALIZE every corpus to the same file count: ScaleUpFresh
    // writes one file per replica, so source parallelism would scale
    // with the rung and mask the data-size trend this sweep exists to
    // measure (a 30x corpus in 30 files out-parallelizes a 1x corpus in
    // 1 file regardless of bytes touched). 32 files = the local[32]
    // slot count, every rung fully parallel.
    rungs.foreach { r =>
      val dst = s"$scratch/xover_r$r"
      if (!new java.io.File(s"$dst/documents.parquet").exists()) {
        ScaleUpFresh.main(Array(src, dst, r.toString))
        val s2 = SparkSession.builder().master("local[8]")
          .config("spark.ui.enabled", "false").getOrCreate()
        Seq("documents", "embeddings").foreach { t =>
          s2.read.parquet(s"$dst/$t.parquet").repartition(32)
            .write.parquet(s"$dst/${t}_n.parquet")
          val fs = new org.apache.hadoop.fs.Path(dst)
            .getFileSystem(s2.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(s"$dst/$t.parquet"), true)
          fs.rename(new org.apache.hadoop.fs.Path(s"$dst/${t}_n.parquet"),
                    new org.apache.hadoop.fs.Path(s"$dst/$t.parquet"))
        }
        s2.stop()
      }
    }

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)

    def medianWall(f: => Unit): Double = {
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      t(1)
    }

    println("| replicas | n_docs | n_vecs | dense brute s | dense indexed s" +
      " | sparse brute s | sparse indexed s |")
    println("|---|---|---|---|---|---|---|")
    rungs.foreach { r =>
      val dir = s"$scratch/xover_r$r"
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
      // untimed offline builds + model preload
      val (cbooks, coarse, codes) =
        graft.similarity.AnnIndex.ivfPqCached(spark, dir)
      graft.operators.SearchIndex.bm25Cached(spark, dir)
      val e = graft.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      // one untimed warm pass each (JIT + file-listing noise out)
      graft.similarity.Knn.topK(spark, dir).collect()
      graft.similarity.Knn
        .ivfPqServe(spark, e, 10, 3, cbooks, coarse, codes).collect()
      graft.operators.Search.bm25(spark, dir).collect()
      graft.operators.SearchIndex.bm25Indexed(spark, dir).collect()

      val dBrute = medianWall(graft.similarity.Knn.topK(spark, dir).collect())
      val dIdx = medianWall(graft.similarity.Knn
        .ivfPqServe(spark, e, 10, 3, cbooks, coarse, codes).collect())
      val sBrute = medianWall(graft.operators.Search.bm25(spark, dir).collect())
      val sIdx = medianWall(
        graft.operators.SearchIndex.bm25Indexed(spark, dir).collect())
      println(f"| ${r}x | $nDocs | $nVecs | $dBrute%.2f | $dIdx%.2f" +
        f" | $sBrute%.2f | $sIdx%.2f |")
    }
    spark.stop()
  }
}
