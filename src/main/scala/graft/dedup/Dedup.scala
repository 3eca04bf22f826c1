package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.rnd
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Deduplication suite for a training-data pipeline.
  *
  * The reference dedups at two levels — whole files by md5 content hash
  * (/root/reference/core/etl_service.py:364-370) and rows by
  * primary-key upsert (core/database_adapter.py). A corpus pipeline needs
  * the document-level generalizations implemented here: exact
  * (normalized-hash groupBy), n-gram Jaccard (exact set similarity over
  * shingles), MinHash+LSH banding and SimHash (sub-quadratic candidate
  * generation), and embedding-cosine near-dup.
  *
  * Scale + codegen notes (the whole point of these shapes):
  *  - exact: map-side hash + one shuffle on the 16-byte hash key.
  *  - ngram-jaccard: explode distinct shingles → self-join *on the
  *    shingle*, so only docs sharing a shingle ever meet; never an n²
  *    cross join. Shingle frequency skew is the risk at 100 TB — the
  *    LSH variants below are the scale path.
  *  - minhash-lsh / simhash: signatures are computed explode-then-
  *    aggregate (min/sum partial aggs, all whole-stage codegen) rather
  *    than per-row nested higher-order functions — HOFs are interpreted
  *    in Spark and cost ~40ms/doc for a 16-hash signature; the exploded
  *    form is >100× faster and is also the formulation that scales
  *    (map-side partial min/sum, one shuffle on doc_id).
  *  - embed-cosine: native codegen'd DotProduct expression; pair join
  *    blocked by `label` (in production: by coarse cluster/LSH bucket)
  *    so the cross join is bounded per block.
  */
object Dedup {

  /** Exact dedup on canonicalized text (whitespace/case-insensitive). */
  def exactDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(normText(col("text"))).as("norm_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_doc_id"))

  /** One row per (doc, distinct 3-gram shingle) — codegen'd relational
    * shingle builder (see TextFunctions.shingleRows). */
  private def explodedShingles(spark: SparkSession, dir: String): DataFrame =
    shingleRows(Tables.documents(spark, dir))

  /** Exact n-gram Jaccard near-dup pairs via shingle-key self-join. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val ex = explodedShingles(spark, dir)
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    val a = ex.select(col("doc_id").as("doc_a"), col("n_sh").as("na"), col("shingle"))
    val b = ex.select(col("doc_id").as("doc_b"), col("n_sh").as("nb"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"), first(col("na")).as("na"),
           first(col("nb")).as("nb"))
      .withColumn("jaccard",
        rnd(col("inter") * 1.0 / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= 0.02)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
  }

  // Fixed affine hash family over a 31-bit prime (deterministic across
  // runs/partitions — required for resumable pipelines). The base hash
  // is reduced mod P before the affine map so a*h+b stays < 2^62 — no
  // ANSI long overflow.
  private val P = 2147483647L
  private val HashParams: Seq[(Long, Long)] = Seq(
    (2654435761L, 104729L), (2246822519L, 130043L), (3266489917L, 2038074743L),
    (668265263L, 999983L), (374761393L, 31337L), (2166136261L, 8191L),
    (16777619L, 524287L), (1099511628211L % P, 6700417L),
    (40503L, 2147483629L), (65599L, 179424673L), (131071L, 15485863L),
    (524287L, 982451653L), (2654435769L, 57885161L), (97L, 32452843L),
    (8527L, 49979687L), (279470273L, 67867967L))

  /** MinHash + LSH banding: 4 bands × 4 rows; docs colliding in any band
    * become candidate pairs; est_jaccard = matching signature fraction.
    * Approximate by design → rows-only check (SURVEY §2.7). */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val hashed = explodedShingles(spark, dir)
      .withColumn("h", pmod(xxhash64(col("shingle")), lit(P)))
    val sigAggs = HashParams.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a % P) + lit(b), lit(P))).as(s"s$i")
    }
    val sigs = hashed.groupBy(col("doc_id"))
      .agg(sigAggs.head, sigAggs.tail: _*)
      .select(col("doc_id"),
              array((0 until 16).map(i => col(s"s$i")): _*).as("sig"))
    val bands = sigs.select(
      col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(3)),
        j => struct(j.as("band_idx"),
                    xxhash64(slice(col("sig"), j * 4 + 1, lit(4))).as("band_hash"))))
        .as("band"))
      .select(col("doc_id"), col("sig"),
              col("band.band_idx"), col("band.band_hash"))
    val l = bands.select(col("band_idx"), col("band_hash"),
                         col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val r = bands.select(col("band_idx"), col("band_hash"),
                         col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        rnd(size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)) / lit(16.0), 4).as("est_jaccard"))
      .distinct()
      .orderBy(col("est_jaccard").desc, col("doc_a"), col("doc_b"))
  }

  /** 64-bit SimHash fingerprint + 16-bit-band candidates + hamming
    * verification. Approximate by design → rows-only check. Per-bit
    * votes are 64 codegen'd sum aggregates over exploded tokens. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(reTokens(col("text"))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitAggs = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$b")
    }
    val votes = tok.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
    val docs = votes.select(col("doc_id"),
      (0 until 64).map(b =>
        when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_)).as("simhash"))
    val banded = docs.select(col("doc_id"), col("simhash"),
      explode(expr(
        """transform(sequence(0, 3),
             j -> struct(j AS band_idx,
                         (shiftright(simhash, j * 16) & 65535) AS band_val))"""))
        .as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band_idx"), col("b.band_val"))
    val l = banded.select(col("band_idx"), col("band_val"),
                          col("doc_id").as("doc_a"), col("simhash").as("h_a"))
    val r = banded.select(col("band_idx"), col("band_val"),
                          col("doc_id").as("doc_b"), col("simhash").as("h_b"))
    l.join(r, Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long")
                .as("hamming"))
      .distinct()
      .filter(col("hamming") <= 16)
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
  }

  /** Embedding-cosine near-dup pairs, blocked by label. */
  def embedCosine(spark: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
    val a = e.select(col("label"), col("vec_id").as("id_a"),
                     col("embedding").as("va"))
    val b = e.select(col("label"), col("vec_id").as("id_b"),
                     col("embedding").as("vb"))
    a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .select(col("label"), col("id_a"), col("id_b"),
              rnd(VectorFunctions.cosine(col("va"), col("vb")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= 0.3)
      .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact_docs"    -> (exactDocs _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_minhash_lsh"   -> (minhashLsh _),
    "dedup_simhash"       -> (simhash _),
    "dedup_embed_cosine"  -> (embedCosine _))

  val oracles: Map[String, String] = Map(
    "dedup_exact_docs" ->
      """SELECT md5(array_to_string(
                  regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS norm_hash,
                count(*) AS n_copies,
                min(doc_id) AS keeper_doc_id
         FROM documents GROUP BY 1""",
    "dedup_ngram_jaccard" ->
      """WITH toks AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
           FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
             THEN list_transform(range(len(w) - 2),
                  i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
             ELSE [] END) AS s
           FROM toks),
         ex AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS na, any_value(b.n_sh) AS nb
           FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b,
                floor((inter * 1.0 / (na + nb - inter)) * 10000 + 0.5) / 10000 AS jaccard
         FROM pairs
         WHERE floor((inter * 1.0 / (na + nb - inter)) * 10000 + 0.5) / 10000 >= 0.02
         ORDER BY jaccard DESC, doc_a, doc_b""",
    "dedup_embed_cosine" ->
      """WITH e AS (
           SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings)
         SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
                floor((list_dot_product(a.v, b.v) /
                      (sqrt(list_dot_product(a.v, a.v)) *
                       sqrt(list_dot_product(b.v, b.v)))) * 10000 + 0.5) / 10000 AS cos_sim
         FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE floor((list_dot_product(a.v, b.v) /
                     (sqrt(list_dot_product(a.v, a.v)) *
                      sqrt(list_dot_product(b.v, b.v)))) * 10000 + 0.5) / 10000 >= 0.3
         ORDER BY cos_sim DESC, id_a, id_b""")
}
