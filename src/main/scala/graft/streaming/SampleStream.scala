package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Num.rnd

/** Streaming twin of the deterministic sampling/split family
  * (operators/Sampling): downsampling and split routing ON THE WIRE,
  * between source and lake writers — the shape a 100 TB/day ingest
  * pipeline needs when only a fraction of the firehose should land,
  * and the train/val/test decision must be made once, at ingest,
  * identically on every replay.
  *
  * `rand()`-based stream sampling is wrong twice: re-running the
  * stream (crash replay, backfill) keeps a DIFFERENT subset, and the
  * kept set depends on how micro-batches happen to chop the data. The
  * md5-coin (Sampling's engine-portable convention: first hex nibble
  * of md5(id) → 0..15) is a pure row function, so both forms here
  * are STATELESS projections/predicates — zero state store, zero
  * shuffle, source-parallel — and the kept set is a pure function of
  * the data: stream ≡ batch row-for-row, and invariant under ANY
  * micro-batch boundary placement (both pinned in SampleStreamSpec).
  *
  *  - [[sampleStream]]: keep rows whose coin < keepOf16 (k/16 rate).
  *  - [[splitStream]]: route every row to train/val/test with
  *    Sampling.splitDocs' exact 13/1/2 nibble bands — the ingest-time
  *    split assignment a `foreachBatch` fan-out writer consumes.
  *  - [[windowedRateAudit]]: the monitoring counterpart — per
  *    event-time window, kept/total and the realized rate from ONE
  *    watermarked aggregate (count + conditional sum in the same
  *    pass), with a flag when the realized rate strays from k/16 by
  *    more than `tol` (a wrong-looking rate at ingest means the id
  *    space is degenerate — e.g. constant ids — not that the coin
  *    drifted; the audit is how that upstream bug pages someone).
  *
  * Module row in SURVEY §2.5 — streaming output has no SQL oracle by
  * design; the coin itself is oracle-checked through the batch
  * sampling entries (sample_deterministic / split_train_test).
  */
object SampleStream {

  /** Sampling's deterministic coin: first md5 nibble of the id, 0..15. */
  private def coin(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 1), 16, 10).cast("int")

  /** Stateless k/16 Bernoulli keep-filter on the stream. */
  def sampleStream(docs: DataFrame, keepOf16: Int = 4): DataFrame = {
    require(keepOf16 > 0 && keepOf16 <= 16, "keepOf16 in 1..16")
    docs.filter(coin(col("doc_id")) < keepOf16)
  }

  /** Stateless train/val/test routing (13/1/2 nibble bands — the
    * batch split_train_test assignment, decided at ingest). */
  def splitStream(docs: DataFrame): DataFrame = {
    val b = coin(col("doc_id"))
    docs.withColumn("split",
      when(b < 13, "train").when(b < 14, "val").otherwise("test"))
  }

  /** Per-window realized sampling rate: ONE watermarked windowed
    * aggregate (total + kept as a conditional sum in the same pass). */
  def windowedRateAudit(docs: DataFrame, keepOf16: Int = 4,
                        tol: Double = 0.15): DataFrame = {
    val expected = keepOf16 / 16.0
    docs
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "6 hours"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(coin(col("doc_id")) < keepOf16, 1L).otherwise(0L))
          .as("n_kept"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00").as("window_start"),
        col("n_total"), col("n_kept"),
        rnd(col("n_kept").cast("double") / col("n_total").cast("double"), 4)
          .as("kept_frac"))
      .withColumn("rate_ok",
        abs(col("kept_frac") - lit(expected)) <= lit(tol))
  }
}
