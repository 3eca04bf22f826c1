package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable temporal-join operators Spark lacks as built-ins: keyed
  * as-of join and binned range join. Both are composed from built-in
  * operators per the extension preference order — the compositions ARE
  * the scalable formulations, so no custom physical operator is needed.
  *
  * The reference has no as-of machinery (SQLite); these generalize the
  * latest-activity-per-key shape its views compute with MAX()
  * aggregates (/root/reference/core/database_schema.py:438,465) to the
  * row-level "state as of this event" lookup a pipeline needs.
  */
object Joins {

  /** Keyed as-of join: for every left row, attach `rightVals` from the
    * LATEST right row of the same `key` with rightTs ≤ leftTs
    * (strict=true: < leftTs); nulls when no such row. With
    * direction="forward", the EARLIEST right row with rightTs ≥ leftTs
    * instead (the next-event lookup) — same plan, reversed ordering.
    * `tolerance` bounds the staleness: a match further than that many
    * ts-units away resolves to null (requires numeric ts columns —
    * this library's convention is integer microseconds).
    *
    * Formulation: tag and union both sides, then one
    * `last(ignoreNulls)` window per value column over a single
    * partitionBy(key) ordering — ONE shuffle on the key, no per-row
    * subquery, no range-condition join that would force a
    * BroadcastNestedLoopJoin. This is the as-of shape that survives
    * 100 TB: both inputs stream through the same exchange, and all
    * windows share one Sort. Ties on (ts) between right rows resolve
    * to the last in (ts, tag) order — give the right side a unique ts
    * per key (or pre-aggregate) for fully pinned semantics.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, rightVals: Seq[String],
           strict: Boolean = false,
           direction: String = "backward",
           tolerance: Option[Long] = None): DataFrame = {
    require(rightVals.nonEmpty, "asOf: rightVals must be non-empty")
    require(Set("backward", "forward").contains(direction),
      s"asOf: direction must be backward|forward, got $direction")
    tolerance.foreach { _ =>
      require(left.schema(leftTs).dataType
                .isInstanceOf[org.apache.spark.sql.types.NumericType],
        "asOf: tolerance requires a numeric ts column (integer micros)")
    }
    val clash = rightVals.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"asOf: right value columns clash with left: $clash")
    // at equal ts the right row must sort BEFORE the left row to be
    // visible (inclusive), AFTER it to be invisible (strict)
    val rTag = if (strict) 1 else 0
    val lTag = 1 - rTag
    // the matched right row travels as ONE struct, so the output never
    // stitches values from different right rows and a matched row whose
    // value column is NULL stays NULL (per-column last(ignoreNulls)
    // would resurrect an older row's value)
    // the matched right ts rides inside the struct so the tolerance
    // check compares against the ACTUAL matched row, atomically
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map(n => right.schema(right.schema.fieldIndex(n))) :+
        org.apache.spark.sql.types.StructField("__rts",
          right.schema(right.schema.fieldIndex(rightTs)).dataType))
    val lNorm = left.select(
      left.columns.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(lTag).as("__tag"),
            lit(null).cast(rvType).as("__rv")): _*)
    val rNorm = right.select(
      left.columns.map(n =>
        if (n == key) col(key)
        else lit(null).cast(left.schema(n).dataType).as(n)) ++
        Seq(col(rightTs).as("__ts"), lit(rTag).as("__tag"),
            struct(rightVals.map(col) :+ col(rightTs).as("__rts"): _*)
              .as("__rv")): _*)
    val tsOrder = if (direction == "forward") col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(col(key))
      .orderBy(tsOrder, col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = lNorm.union(rNorm)
      .select(
        left.columns.map(col) :+ col("__tag") :+
          last(col("__rv"), ignoreNulls = true).over(w).as("__rv"): _*)
      .filter(col("__tag") === lTag)
    val rv = tolerance match {
      case None => col("__rv")
      case Some(tol) =>
        val dist =
          if (direction == "forward") col("__rv").getField("__rts") - col(leftTs)
          else col(leftTs) - col("__rv").getField("__rts")
        when(dist <= tol, col("__rv")) // null __rv stays null
    }
    matched.select(left.columns.map(col) ++
      rightVals.map(n => rv.getField(n).as(n)): _*)
  }

  /** Key-less point-in-interval range join: rows of `points` matched to
    * every `intervals` row with start ≤ point ≤ end (inclusive).
    *
    * The naive formulation (join on the range predicate alone) has no
    * equi key, so Spark plans a BroadcastNestedLoopJoin — O(|P|·|I|)
    * and a broadcast of a whole side. Binning restores an equi key:
    * each interval replicates to its ⌈len/binWidth⌉+1 covering bins,
    * each point hashes to exactly one bin, and the equi-join on the bin
    * shuffle-partitions like any other join (each point meets an
    * interval in exactly one bin — the point's own — so no dedup pass
    * is needed). Pick binWidth near the typical interval length:
    * replication stays O(1) per interval while bucket selectivity does
    * the pruning.
    */
  def pointInRange(points: DataFrame, pointCol: String,
                   intervals: DataFrame, startCol: String, endCol: String,
                   binWidth: Long): DataFrame = {
    require(binWidth > 0, "pointInRange: binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(col(startCol) / binWidth),
                       floor(col(endCol) / binWidth))))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) &&
              col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
