package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared text-analysis column builders.
  *
  * Everything here is pure `Column` composition over Spark built-ins and
  * higher-order functions — no UDFs — so every consumer stays inside
  * whole-stage codegen and the same expressions are portable to the
  * DuckDB oracles (see SURVEY §5).
  */
object TextFunctions {

  /** Whitespace tokens (the reference's pandas `str.split()` shape). */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** Regex word tokens: lowercase alnum runs (BPE-ish normalization). */
  def reTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** Canonical text: regex tokens re-joined on single spaces. */
  def normText(text: Column): Column = array_join(reTokens(text), " ")

  /** Repair CP1252-mojibake'd smart punctuation — the reference's
    * encoding-fix pass (/root/reference/core/etl_service.py:704-718:
    * smart apostrophe/quotes read through the wrong codec). Longer
    * sequences replace first so the 2-char prefix fix can't clobber
    * them. */
  def fixMojibake(text: Column): Column = {
    val fixes = Seq(
      "\u00e2\u20ac\u2122" -> "'",   // smart apostrophe
      "\u00e2\u20ac\u0153" -> "\"",  // left smart quote
      "\u00e2\u20ac\u201c" -> "-",   // en dash
      "\u00e2\u20ac" -> "\"")        // right-smart-quote remnant
    fixes.foldLeft(text) { case (c, (bad, good)) =>
      replace(c, lit(bad), lit(good))
    }
  }

  /** Word-k-grams (shingles) over an already-tokenized array, distinct. */
  def shingles(tokens: Column, k: Int): Column = {
    val gram = transform(
      sequence(lit(0), greatest(size(tokens) - k, lit(-1))),
      i => concat_ws(" ", (0 until k).map(j => element_at(tokens, i + j + 1)): _*))
    array_distinct(when(size(tokens) >= k, gram).otherwise(array()))
  }

  /** One row per (doc_id, distinct word-3-gram) over a documents frame.
    *
    * Row-wise `shingles()` is interpreted (higher-order functions have no
    * codegen) and costs ~2ms/doc; this relational formulation —
    * posexplode + two window leads + distinct — is fully codegen'd and
    * shuffles once on doc_id, which is also the shape that scales: the
    * follow-up aggregations (minhash mins, jaccard intersections) are
    * partial-agg friendly. */
  def shingleRows(docs: DataFrame, distinct: Boolean = true): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val rows = docs.select(col("doc_id"),
                posexplode(reTokens(col("text"))).as(Seq("pos", "w")))
      .withColumn("w2", lead(col("w"), 1).over(byDoc))
      .withColumn("w3", lead(col("w"), 2).over(byDoc))
      .filter(col("w3").isNotNull)
      .select(col("doc_id"),
              concat_ws(" ", col("w"), col("w2"), col("w3")).as("shingle"))
    // Min-style consumers (minhash) are multiset-insensitive and can
    // skip the dedup aggregation.
    if (distinct) rows.distinct() else rows
  }

  /** How many of `words` appear in the fixed vocabulary. */
  def vocabHits(words: Column, vocab: Seq[String]): Column =
    size(filter(words, w => w.isin(vocab.map(v => v: Any): _*)))

  /** Sum of token lengths (for avg word length). */
  def totalChars(words: Column): Column =
    aggregate(words, lit(0), (acc, w) => acc + length(w))
}
