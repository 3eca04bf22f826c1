package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Num.rnd

/** Streaming twin of the batch PSI drift report (operators/Etl
  * .psiDrift): continuous DISTRIBUTION monitoring over an event
  * stream — the companion to QualityMonitor's constraint checks.
  * Constraints catch rows that are individually wrong; PSI catches a
  * stream whose rows are all individually fine while the MIX silently
  * shifts (an upstream filter change, a traffic-source flip — the
  * failure mode that degrades a trained model with zero alerts).
  * The reference's analytics stack has the batch form only; a lake
  * pipeline at 100 TB/day needs it next to the writers.
  *
  * Shape: `value` bins into the same fixed equi-width buckets as the
  * batch report (engine-exact boundaries); per event-time window ALL
  * B bucket counts are conditional sums inside ONE watermarked
  * windowed aggregate — a (window × bucket) grouping would need a
  * second stateful aggregate for the window totals, while here PSI
  * assembles in-row from the B count columns against the BROADCAST
  * baseline fractions (a bounded model parameter, like the ANN
  * codebooks: B doubles computed once from the training-window
  * reference frame). State is bounded by the watermark horizon ×
  * one row per window. Alerting follows the standard monitoring
  * rule: PSI > 0.1 investigate, > 0.25 act.
  *
  * Tested in DriftStreamSpec: streamed windows pin to the identical
  * batch aggregation, a planted concentrated window crosses the act
  * threshold while in-distribution windows stay ok, and the baseline
  * builder mirrors the stream-side smoothing. Module row in SURVEY
  * §2.5 — streaming output has no SQL oracle by design.
  */
object DriftStream {

  /** Fixed equi-width value buckets (etl_psi_drift's convention:
    * engine-exact boundaries; the data-adaptive variant would be
    * quantile bins). events.value ranges ~[0, 10000]. */
  private val B = 6
  private val Width = 2000.0

  // clamped BOTH ends: without the floor-at-0, a negative value would
  // land in bucket -1 — skipped by the windowed conditional sums but
  // counted by a naive total, silently skewing every fraction
  private def bucketOf(value: Column): Column =
    greatest(least(floor(value / Width), lit((B - 1).toDouble)), lit(0.0))
      .cast("int")

  /** Baseline bucket fractions from a static reference frame (the
    * model-training window), add-half smoothed EXACTLY like the
    * stream side so PSI(ref, ref-distributed window) ≈ 0. The result
    * is B doubles — a bounded model parameter; the one collect is the
    * codebook-pull contract. */
  def baselineFromStatic(ref: DataFrame): IndexedSeq[Double] = {
    val counts = ref.select(bucketOf(col("value")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val tot = counts.values.sum.toDouble
    (0 until B).map(i =>
      (counts.getOrElse(i, 0L) + 0.5) / (tot + 0.5 * B))
  }

  /** Per-window PSI vs the baseline: one watermarked windowed
    * aggregate, PSI + alert assembled in-row over the B columns. */
  def windowedPsi(events: DataFrame,
                  baseline: IndexedSeq[Double]): DataFrame = {
    require(baseline.length == B, s"need $B baseline fractions")
    val counts = (0 until B).map(i =>
      sum(when(bucketOf(col("value")) === i, 1L).otherwise(0L)).as(s"n_$i"))
    val agg = events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "6 hours"))
      .agg(counts.head, counts.tail: _*)
    val tot = (0 until B).map(i => col(s"n_$i")).reduce(_ + _)
    val psi = (0 until B).map { i =>
      val p = (col(s"n_$i") + 0.5) / (tot.cast("double") + 0.5 * B)
      val q = lit(baseline(i))
      (p - q) * log(p / q)
    }.reduce(_ + _)
    agg.select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00")
          .as("window_start"),
        tot.as("n_rows"), rnd(psi, 6).as("psi"))
      .withColumn("alert",
        when(col("psi") > 0.25, "act")
          .when(col("psi") > 0.1, "investigate")
          .otherwise("ok"))
  }
}
