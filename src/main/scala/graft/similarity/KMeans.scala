package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Distributed Lloyd's k-means over an embedding column — the codebook
  * trainer for the IVF/PQ/RQ family (which previously used id-strided
  * samples as honest stand-ins) and the cluster step of semantic dedup
  * (dedup.Dedup.semantic).
  *
  * The centroid set is a BOUNDED MODEL PARAMETER (k×dim doubles, a few
  * KB independent of corpus size), so each Lloyd round collects it to
  * the driver and inlines it as literals — which makes the ASSIGNMENT
  * step a PURE MAP: one codegen'd argmax chain per row (k native dot
  * products), no join, no broadcast, no shuffle. The UPDATE step is one
  * map-side-combined `groupBy(cluster, pos)` aggregation over the
  * posexploded components: the explode is map-local and the partial
  * combine collapses it in-partition, so each Lloyd round shuffles at
  * most k×dim partial rows per input partition — at 100 TB a round is
  * a scan plus a k×dim-sized exchange.
  *
  * The literal-argmax formulation bounds k (codegen method size); it is
  * the right shape for codebook-scale k (≤ ~64). Beyond that (e.g.
  * SemDeDup's 100k clusters) assignment switches to the broadcast
  * codebook + max_by groupBy shape already in Knn.assignToCentroids —
  * same per-round shuffle profile, one extra exchange.
  *
  * Driver-side work per round is O(k×dim) model arithmetic on the
  * collected stats — model fitting, not a data loop (same contract as
  * the CC convergence check and the PQ/RQ codebook collects).
  */
object KMeans {

  /** Past this k the literal-argmax expression chain stops being the
    * right shape (codegen method size, plan bloat) and assignment
    * switches to the broadcast-centroids max_by regime. */
  private[graft] val LiteralArgmaxMaxK = 64

  /** Assignment dispatch: appends `cluster` (1-based) and `sqdist`
    * (‖x − c_cluster‖², clamped at 0 against FP drift) to a
    * (vec_id, embedding) frame. Codebook-scale k inlines centroids as
    * literals (pure map, zero shuffles); past [[LiteralArgmaxMaxK]]
    * (e.g. SemDeDup-scale cluster counts) it switches to the broadcast
    * + max_by shape — KMeansSpec pins the two regimes row-identical. */
  private[graft] def assign(e: DataFrame,
                            cents: IndexedSeq[Array[Double]]): DataFrame =
    if (cents.length <= LiteralArgmaxMaxK) assignLiteral(e, cents)
    else assignBroadcast(e, cents)

  /** Literal-centroid regime: argmax(2·x·cᵢ − ‖cᵢ‖²) ⇔ argmin‖x − cᵢ‖²
    * (x·x is constant per row); ties break to the lowest cluster id via
    * the (score, −i) struct ordering. Pure map — at 100 TB a scan. */
  private[graft] def assignLiteral(e: DataFrame,
                                   cents: IndexedSeq[Array[Double]]): DataFrame = {
    def sqn(v: Array[Double]): Double = v.map(x => x * x).sum
    val v = col("embedding")
    val best = array_max(array(cents.zipWithIndex.map { case (c, i) =>
      struct(
        (lit(2.0) * VectorFunctions.dot(v, typedlit(c.toSeq)) - lit(sqn(c)))
          .as("s"),
        lit(-(i + 1)).as("negi"))
    }: _*))
    e.withColumn("b", best)
      .withColumn("cluster", -col("b.negi"))
      .withColumn("sqdist",
        greatest(VectorFunctions.dot(v, v) - col("b.s"), lit(0.0)))
      .drop("b")
  }

  /** Large-k regime: centroids broadcast as a tiny frame, the expanded
    * vector × centroid product is reduced by max_by over groupBy(vec_id)
    * — a hash aggregate with map-side partial combine, so the shuffle
    * carries one best-so-far row per vector per partition, never the
    * expanded product (the Knn.assignToCentroids shape). Same score
    * formula and tie-break as the literal regime. */
  private[graft] def assignBroadcast(e: DataFrame,
                                     cents: IndexedSeq[Array[Double]]): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val cdf = cents.zipWithIndex
      .map { case (c, i) => (i + 1, c.toSeq, c.map(x => x * x).sum) }
      .toDF("c_id", "cv", "c_sqn")
    e.crossJoin(broadcast(cdf))
      .withColumn("s",
        lit(2.0) * VectorFunctions.dot(col("embedding"), col("cv")) - col("c_sqn"))
      .groupBy(col("vec_id"))
      .agg(first(col("embedding")).as("embedding"),
           max_by(struct(col("c_id"), col("s")),
                  struct(col("s"), -col("c_id"))).as("b"))
      .select(col("vec_id"), col("embedding"),
              col("b.c_id").as("cluster"),
              greatest(VectorFunctions.dot(col("embedding"), col("embedding")) -
                         col("b.s"), lit(0.0)).as("sqdist"))
  }

  /** Bounded training frame shared by every inline Lloyd fit of an
    * entry (r14, guide §1.2/§2.4): Knn.ivfPqFit introduced the
    * Faiss-style train() contract — codebook quality needs thousands
    * of representatives, not the corpus — and r14 moves the shared
    * gate here so EVERY inline trainer (pqTrainedOn's M subspace fits,
    * fitRqTrained's two levels, ivfTrained, kmeansProfile,
    * Dedup.semanticPairs) uses it. Past `cap` rows the training input
    * is a deterministic md5-ordered sample (TakeOrderedAndProject:
    * bounded per-partition heaps, O(cap) memory, one pass, no global
    * sort), eagerly localCheckpointed so the M fits × rounds read ONE
    * materialized ≤cap-row pin instead of each re-executing the corpus
    * scan (pqTrainedOn alone re-ran it M×rounds+inits ≈ 16 times per
    * call at 100 TB). UNDER the cap the frame passes through UNTOUCHED
    * — the exact pre-sampling plan, so test-SF corpora pay one bounded
    * probe job and entry outputs stay byte-identical by construction
    * (an r14 A/B measured the eager under-cap pin variant NET-NEGATIVE
    * at sf0.1: the probe+materialize jobs cost more than the trivial
    * ≤cap-row rescans they save — honest negative result, reverted).
    * The gate is a BOUNDED existence probe, not a count, and it runs
    * as ONE job with NO exchange: a per-partition count capped at
    * cap+1 rows, folded on the driver — Σ min(rows_p, cap+1) > cap ⟺
    * total > cap, so the capped partials decide the gate exactly.
    * (A/B'd alternatives both lost: limit().count() pays a
    * global-limit shuffle + AQE stage materialization; take(cap+1)
    * under the cap escalates through ~log rounds of incremental
    * partition jobs to prove the rows aren't there.) Each partition
    * reads at most cap+1 rows of one int column however large the
    * corpus. */
  private[graft] def trainPin(e: DataFrame, cap: Int = Knn.TrainCap): DataFrame = {
    val overCap = e.select(lit(1).as("one")).queryExecution.toRdd
      .mapPartitions(it => Iterator(it.take(cap + 1).size.toLong))
      .fold(0L)(_ + _) > cap
    if (!overCap) e
    else e.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(cap)
      .localCheckpoint(true)
  }

  /** Lloyd iterations from a deterministic id-strided init. Returns the
    * final centroids and the inertia (Σ min-sqdist) measured at the
    * START of each round — non-increasing by the Lloyd argument, which
    * KMeansSpec asserts. Stops early when the update is a fixed point.
    * Empty clusters keep their previous centroid. */
  def fit(e: DataFrame, k: Int, maxIter: Int)
      : (IndexedSeq[Array[Double]], Seq[Double]) = {
    import e.sparkSession.implicits._
    require(k >= 1 && maxIter >= 1, s"need k>=1, maxIter>=1; got $k, $maxIter")
    val init = e.filter(col("vec_id") % 17 === 0).orderBy(col("vec_id"))
      .limit(k).select(col("embedding").cast("array<double>"))
      .as[Seq[Double]].collect().map(_.toArray)
    require(init.nonEmpty, "k-means init sample is empty")
    val dim = init.head.length
    var cents: IndexedSeq[Array[Double]] = init.toIndexedSeq
    val inertias = scala.collection.mutable.ArrayBuffer.empty[Double]
    var iter = 0
    var fixedPoint = false
    while (iter < maxIter && !fixedPoint) {
      // One job per round: cluster/sqdist are row-local, the explode is
      // map-side, and the (cluster, pos) hash agg partial-combines, so
      // the shuffle carries ≤ k×dim rows per input partition. sqdist is
      // replicated across a row's dim exploded components, so
      // Σ sd / dim recovers the true inertia from the same pass.
      val stats = assign(e, cents)
        .select(col("cluster"), col("sqdist"),
                posexplode(col("embedding")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"),
             sum(col("sqdist")).as("sd"))
        .collect()
      inertias += stats.iterator.map(_.getAs[Double]("sd")).sum / dim
      val next = Array.tabulate(cents.length)(i => cents(i))
      stats.groupBy(_.getAs[Int]("cluster")).foreach { case (c, rows) =>
        val arr = new Array[Double](dim)
        rows.foreach { r =>
          arr(r.getAs[Int]("pos")) =
            r.getAs[Double]("s") / r.getAs[Long]("n")
        }
        next(c - 1) = arr
      }
      fixedPoint = cents.indices.forall(i => cents(i).sameElements(next(i)))
      cents = next.toIndexedSeq
      iter += 1
    }
    (cents, inertias.toSeq)
  }
}
