package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.rnd
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over the embeddings table.
  *
  * Two paths per SURVEY §2.8: exact brute-force cosine top-k (the
  * correctness baseline, oracle-checked) and random-hyperplane LSH
  * bucketing (the scale path, approximate → rows-only).
  *
  * Scale notes: brute force broadcasts the (small) query set against the
  * corpus — a map-side cross product with a per-query top-k reduced via
  * window row_number; at 100 TB the corpus side stays partitioned and
  * only k rows per query per partition survive the shuffle (partial
  * top-k via the aggregate pushdown AQE applies to window-limits).
  * The LSH path buckets the corpus map-only (16 deterministic
  * hyperplanes → 16-bit signature), so candidate generation touches
  * only same-bucket rows — the standard sub-linear ANN layout where
  * each bucket's cross join is bounded.
  */
object Knn {

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * sign of xxhash64 of the pair — reproducible across runs/engines. */
  private def planeSign(j: Int) =
    (d: org.apache.spark.sql.Column) =>
      when(xxhash64(concat_ws("_", lit(j), d)) % 2 === 0, 1.0).otherwise(-1.0)

  /** Brute-force cosine top-10 for query vectors (vec_id < 5). */
  def topK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), widen(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val cand = e.select(col("vec_id").as("neighbor_id"), col("v").as("nv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    cand.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_raw", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("neighbor_id"),
              rnd(col("cos_raw"), 4).as("cos_sim"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Random-hyperplane LSH: 16-bit signatures, bucket stats + top
    * intra-bucket pairs. Approximate → rows-only check. */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), widen(col("embedding")).as("v"))
    // bit_j = 1 iff dot(v, h_j) >= 0, h_j[d] = deterministic ±1
    val sigBits = (0 until 16).map { j =>
      val proj = aggregate(
        zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
          (x, d) => x * planeSign(j)(d)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    val bucketed = e.withColumn("bucket", sigBits.reduce(_ + _))
    val l = bucketed.select(col("bucket"), col("vec_id").as("id_a"),
                            col("v").as("va"))
    val r = bucketed.select(col("bucket"), col("vec_id").as("id_b"),
                            col("v").as("vb"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("bucket"), col("id_a"), col("id_b"),
              rnd(cosine(col("va"), col("vb")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
      .limit(100)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk" -> (topK _),
    "ann_lsh"  -> (lshBuckets _))

  val oracles: Map[String, String] = Map(
    "ann_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
         scored AS (
           SELECT q.query_id, e.vec_id AS neighbor_id,
                  list_dot_product(q.qv, e.v) /
                  (sqrt(list_dot_product(q.qv, q.qv)) *
                   sqrt(list_dot_product(e.v, e.v))) AS cos_raw
           FROM q JOIN e ON e.vec_id <> q.query_id),
         ranked AS (
           SELECT query_id, neighbor_id, cos_raw,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_raw DESC, neighbor_id) AS rank
           FROM scored)
         SELECT query_id, neighbor_id, floor((cos_raw) * 10000 + 0.5) / 10000 AS cos_sim,
                CAST(rank AS BIGINT) AS rank
         FROM ranked WHERE rank <= 10
         ORDER BY query_id, rank""")
}
