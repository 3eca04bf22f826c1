package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tools.CorpusCache

/** Persisted IVF-PQ index — the offline-build / online-serve split a
  * production ANN deployment actually runs (Faiss builds IndexIVFPQ
  * once and mmaps it; the Spark-lake equivalent is a codes table +
  * a tiny codebook table, rebuilt only when the corpus changes):
  *
  *  - BUILD (once per corpus fingerprint): train the coarse quantizer
  *    + M sub-codebooks (Knn.ivfPqFit — M+1 concurrent Lloyd fits),
  *    encode every vector to (cluster, M byte codes) in one pure-map
  *    scan, and persist: `codes/` range-clustered on `cluster` via
  *    LakeSink (per-file min/max lets a cell-pruned read skip files)
  *    and `model/` holding the ~5 KB of centroids as rows.
  *  - SERVE (every query batch): read the codes table — never the raw
  *    embeddings — probe nprobe cells from the literal coarse
  *    centroids, ADC-rank through the broadcast LUT (Knn.ivfPqServe).
  *
  * The cache key is the corpus file's (mtime, length) fingerprint
  * (CorpusCache), so testdata regeneration invalidates the index.
  * AnnIndexSpec proves served output ≡ the inline-trained ivfPqOn and
  * that the second call is a pure cache hit. */
object AnnIndex {

  /** Build-or-load the index for `dir`'s embeddings table. Returns
    * (sub-codebooks, coarse centroids, codes frame); the codes frame
    * is (vec_id, cluster, m, code) read lazily from the cache. */
  def ivfPqCached(spark: SparkSession, dir: String)
      : (IndexedSeq[IndexedSeq[Array[Double]]], IndexedSeq[Array[Double]],
         DataFrame) = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val cache = CorpusCache.dirFor(dir, "embeddings", "ivfpq")
    val modelPath = new java.io.File(cache, "model").getPath
    val codesPath = new java.io.File(cache, "codes").getPath
    if (!CorpusCache.isBuilt(new java.io.File(cache, "model"))) {
      val e = graft.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val (cbooks, coarse) = Knn.ivfPqFit(e)
      val codes = ivfPqAdd(e, cbooks, coarse)
      // codes first: the model dir's _SUCCESS is the build-complete
      // marker, so it must be the LAST thing written (a crash between
      // the two writes leaves an unbuilt cache, not a torn index)
      graft.sinks.LakeSink.writeClustered(codes, codesPath, nFiles = 4,
        col("cluster"))
      val modelRows =
        coarse.zipWithIndex.map { case (v, i) =>
          (-1, i + 1, v.toSeq) } ++
        (for { m <- cbooks.indices; cw <- cbooks(m).indices }
          yield (m, cw + 1, cbooks(m)(cw).toSeq))
      modelRows.toDF("m", "cw", "vec").coalesce(1)
        .write.mode("overwrite").parquet(modelPath)
    }
    // load the ~5 KB model (bounded parameter — the codebook-collect
    // contract); codes stay a lazy frame
    val rows = spark.read.parquet(modelPath)
      .select(col("m"), col("cw"), col("vec"))
      .as[(Int, Int, Seq[Double])].collect()
    val coarse = rows.filter(_._1 == -1).sortBy(_._2)
      .map(_._3.toArray).toIndexedSeq
    val cbooks = rows.filter(_._1 >= 0).groupBy(_._1).toIndexedSeq
      .sortBy(_._1)
      .map { case (_, cws) => cws.sortBy(_._2).map(_._3.toArray).toIndexedSeq }
    (cbooks, coarse, spark.read.parquet(codesPath))
  }

  /** Index-DRIFT monitor — operationalizes the retrain trigger the add
    * path defers to ("retrain only on measured drift"): per coarse
    * cell, the build-time occupancy read from the persisted codes
    * table (the index itself is the baseline — no extra stats table to
    * version) vs the CURRENT corpus's assignment under the same frozen
    * centroids, scored with the standard PSI drift term per cell plus
    * the live mean quantization distance (the inertia the cell now
    * pays under the stale centroids). Production rule: retrain when
    * Σ psi_term crosses ~0.2 (the etl_psi_drift convention) or the
    * quantization distance trends up.
    *
    * Scale: the baseline is a column-pruned scan of the codes table
    * (one m-slice → one count per cell), the current side is a
    * pure-map literal-centroid assign + one partial-agg count — both
    * sides reduce to ≤K_coarse rows before the join. */
  def driftMonitor(spark: SparkSession, dir: String): DataFrame = {
    val (_, coarse, codes) = ivfPqCached(spark, dir)
    val base = codes.filter(col("m") === 0)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n_base"))
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    driftFrom(base, e, coarse)
  }

  /** Frame-level core: `base` is (cluster, n_base); the spec plants a
    * shifted corpus through it to prove drift is detected. */
  private[graft] def driftFrom(base: DataFrame, e: DataFrame,
                               coarse: IndexedSeq[Array[Double]]): DataFrame = {
    import graft.functions.Num.rnd
    val now = KMeans.assign(e, coarse)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_now"),
           avg(col("sqdist")).as("msd"))
    val joined = base.join(now, Seq("cluster"), "full_outer")
      .select(col("cluster"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_now"), lit(0L)).as("n_now"),
        coalesce(col("msd"), lit(0.0)).as("msd"))
    // totals via a window over the ≤K_coarse-row cell frame (NOT the
    // corpus): single-partition is fine on a model-sized frame and
    // avoids an eager second pass over the aggregation
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    val tb = greatest(sum(col("n_base")).over(all), lit(1L))
    val tn = greatest(sum(col("n_now")).over(all), lit(1L))
    // PSI with the usual epsilon floor so empty cells stay finite
    val eps = lit(1e-6)
    val fb = greatest(col("n_base") / tb.cast("double"), eps)
    val fn = greatest(col("n_now") / tn.cast("double"), eps)
    joined.select(col("cluster"), col("n_base"), col("n_now"),
        rnd(fb, 6).as("frac_base"), rnd(fn, 6).as("frac_now"),
        rnd((fn - fb) * log(fn / fb), 6).as("psi_term"),
        rnd(col("msd"), 4).as("mean_sqdist_now"))
      .orderBy(col("cluster"))
  }

  /** Incremental ADD — the Faiss `add()` path: encode a NEW vector
    * batch against the FIXED trained model (coarse + sub-codebooks)
    * with no retrain — two pure map passes (cell assign + PQ encode)
    * and a narrow join on vec_id, so a daily embedding increment costs
    * O(|batch|) regardless of corpus size. In production the result
    * appends to the persisted codes table on the same cluster
    * range-clustering (LakeSink append), and the model retrains only
    * on measured drift. The build's own full-corpus encode IS this
    * function (ivfPqCached calls it), so add-encoding ≡ what a full
    * re-encode with the same model gives — AnnIndexSpec additionally
    * proves served-output identity between append and re-encode. */
  def ivfPqAdd(newVecs: DataFrame,
               cbooks: IndexedSeq[IndexedSeq[Array[Double]]],
               coarse: IndexedSeq[Array[Double]]): DataFrame = {
    val cells = KMeans.assign(newVecs, coarse)
      .select(col("vec_id"), col("cluster"))
    Knn.pqEncode(newVecs, cbooks).join(cells, Seq("vec_id"))
      .select(col("vec_id"), col("cluster"), col("m"), col("code"))
  }
}
