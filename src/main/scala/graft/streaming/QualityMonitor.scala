package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.functions.Num.rnd

/** Streaming twin of the batch expectation suite (operators/Stats
  * .expectations): continuous data-quality monitoring over an event
  * stream — the Deequ-on-streams shape a lake ingestion pipeline runs
  * next to its writers, so constraint regressions page BEFORE a day of
  * bad batches lands.
  *
  * Two forms:
  *  - [[windowedExpectations]]: per event-time window, the constraint
  *    metrics (null fraction, range fraction, set membership) computed
  *    as ONE watermarked windowed aggregate — map-side combined,
  *    state bounded by the watermark horizon, identical math to the
  *    batch suite so a window's row is comparable across the two.
  *  - [[runningCounts]]: cumulative per-key constraint tallies via
  *    keyed state (mapGroupsWithState) — O(keys) state, emits the
  *    updated lifetime metrics every trigger; the "total rows ever /
  *    violations ever" dashboard counter.
  *
  * Tested via MemoryStream in QualityMonitorSpec (windowed metrics pin
  * to the identical batch aggregation on the same data; the stateful
  * form pins to driver-side recomputation). Module row in SURVEY §2.5
  * — streaming output has no SQL oracle by design.
  */
object QualityMonitor {

  /** The known-good event-type domain (constraint: set membership). */
  private val TypeSet = Seq("click", "view", "purchase", "signup", "error")

  /** Per-window constraint metrics over (ts, event_type, value). */
  def windowedExpectations(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "6 hours"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
        sum(when(col("value") >= 0.0 && col("value") <= 10000.0, 1L)
          .otherwise(0L)).as("n_value_in_range"),
        sum(when(col("event_type").isin(TypeSet: _*), 1L).otherwise(0L))
          .as("n_type_in_set"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00").as("window_start"),
        col("n_rows"),
        rnd(col("n_null_value").cast("double") / col("n_rows").cast("double"), 4)
          .as("null_value_frac"),
        rnd(col("n_value_in_range").cast("double") / col("n_rows").cast("double"), 4)
          .as("value_range_frac"),
        rnd(col("n_type_in_set").cast("double") / col("n_rows").cast("double"), 4)
          .as("type_set_frac"))
      .withColumn("passed",
        col("null_value_frac") === 0.0 &&
        col("value_range_frac") >= 0.99 && col("type_set_frac") === 1.0)

  case class Rec(event_type: String, value: Double)
  case class Tally(n: Long, nRangeViol: Long)
  case class TypeQuality(event_type: String, n_rows: Long,
                         n_range_violations: Long, violation_frac: Double)

  /** Cumulative per-type tallies: lifetime row and range-violation
    * counts per event_type, updated every trigger. State is O(types). */
  def runningCounts(recs: Dataset[Rec]): Dataset[TypeQuality] = {
    import recs.sparkSession.implicits._
    recs.groupByKey(_.event_type)
      .mapGroupsWithState[Tally, TypeQuality](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Rec], state: GroupState[Tally]) =>
          var st = state.getOption.getOrElse(Tally(0L, 0L))
          rows.foreach { r =>
            val viol = r.value < 0.0 || r.value > 10000.0
            st = Tally(st.n + 1, st.nRangeViol + (if (viol) 1 else 0))
          }
          state.update(st)
          TypeQuality(key, st.n, st.nRangeViol,
            math.floor(st.nRangeViol.toDouble / st.n * 10000 + 0.5) / 10000)
      }
  }
}
