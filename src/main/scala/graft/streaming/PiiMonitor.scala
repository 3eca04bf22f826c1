package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Pii
import graft.functions.Num.rnd

/** Streaming twin of the batch PII layer (operators/Pii): redaction on
  * the wire plus continuous incidence monitoring — the shape a lake
  * ingestion pipeline runs BETWEEN source and sink so raw PII never
  * lands in the lake at all, with the monitor paging when a source
  * starts leaking (a new upstream field, a broken upstream scrub).
  *
  * Both forms execute the SAME Catalyst expressions as the batch
  * entries ([[Pii.scrub]] / [[Pii.matches]]), so the DuckDB oracle
  * that checks text_pii_scrub/text_pii_stats checks this math too,
  * and stream ≡ batch holds by construction (pinned in PiiMonitorSpec):
  *
  *  - [[scrubStream]]: STATELESS per-row projection — chained
  *    codegen'd regexp_replace, no watermark, no state store, no
  *    shuffle; it pipelines at source parallelism, the ideal streaming
  *    operator shape (a malformed-row quarantine column rides along).
  *  - [[windowedIncidence]]: per event-time window, per-type match
  *    counts as ONE watermarked windowed aggregate (map-side combined,
  *    state bounded by the watermark horizon) with an alert flag when
  *    incidence crosses the page threshold.
  *
  * Module row in SURVEY §2.5 — streaming output has no SQL oracle by
  * design; parity rides the batch entries' full oracles.
  */
object PiiMonitor {

  /** Inline redaction: (ts, doc_id, text) → (ts, doc_id, text_redacted,
    * pii_found). Stateless — safe to run at source parallelism with
    * zero state store involvement. */
  def scrubStream(docs: DataFrame): DataFrame =
    docs.select(
      col("ts"), col("doc_id"),
      Pii.scrub(col("text")).as("text_redacted"),
      (Pii.matches(col("text"), Pii.PhonePat) +
       Pii.matches(col("text"), Pii.SsnPat) +
       Pii.matches(col("text"), Pii.EmailPat) +
       Pii.matches(col("text"), Pii.IpPat)).as("pii_found"))

  /** Per-window PII incidence with an alert when more than `alertFrac`
    * of a window's documents carry PII (post-scrub pipelines expect
    * ~zero; any sustained incidence is an upstream leak). */
  def windowedIncidence(docs: DataFrame, alertFrac: Double = 0.01): DataFrame =
    docs
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "6 hours"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(Pii.matches(col("text"), Pii.PhonePat) +
                 Pii.matches(col("text"), Pii.SsnPat) +
                 Pii.matches(col("text"), Pii.EmailPat) +
                 Pii.matches(col("text"), Pii.IpPat) > 0, 1L).otherwise(0L))
          .as("n_docs_with_pii"),
        sum(Pii.matches(col("text"), Pii.PhonePat)).as("m_phone"),
        sum(Pii.matches(col("text"), Pii.SsnPat)).as("m_ssn"),
        sum(Pii.matches(col("text"), Pii.EmailPat)).as("m_email"),
        sum(Pii.matches(col("text"), Pii.IpPat)).as("m_ip"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00").as("window_start"),
        col("n_docs"), col("n_docs_with_pii"),
        col("m_phone"), col("m_ssn"), col("m_email"), col("m_ip"),
        rnd(col("n_docs_with_pii").cast("double") / col("n_docs").cast("double"), 4)
          .as("pii_frac"))
      .withColumn("alert", col("pii_frac") > alertFrac)
}
