package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * `queries` aggregates every operator family's map; `oracleSql` holds the
  * DuckDB-equivalent SQL for the hash-checked subset (approximate/stub ops
  * are rows-only by design, see SURVEY §2 "oracle" column).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The pretraining prep chain exercises the library end-to-end: quality
    * + repetition gates, exact dedup, decontamination, corpus accounting
    * — one composed Catalyst plan (TextOps.pretrainPipeline). */
  def entry(spark: SparkSession): DataFrame =
    operators.TextOps.pretrainPipeline(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Etl.queries ++
    operators.Reports.queries ++
    operators.Filters.queries ++
    operators.TableOps.queries ++
    operators.Timelines.queries ++
    operators.Tpch.queries ++
    operators.TpchExtra.queries ++
    operators.Events.queries ++
    operators.TextOps.queries ++
    operators.Sampling.queries ++
    operators.BpeVocab.queries ++
    dedup.Dedup.queries ++
    dedup.SubstrDedup.queries ++
    similarity.Knn.queries ++
    graph.PageRank.queries ++
    graph.LabelProp.queries ++
    graph.Triangles.queries ++
    operators.Integrity.queries ++
    operators.Search.queries ++
    operators.Stats.queries ++
    operators.Trend.queries ++
    operators.Pii.queries ++
    multimodal.BinaryPipeline.queries

  def oracleSql: Map[String, String] =
    operators.Etl.oracles ++
    operators.Reports.oracles ++
    operators.Filters.oracles ++
    operators.TableOps.oracles ++
    operators.Timelines.oracles ++
    operators.Tpch.oracles ++
    operators.TpchExtra.oracles ++
    operators.Events.oracles ++
    operators.TextOps.oracles ++
    operators.Sampling.oracles ++
    operators.BpeVocab.oracles ++
    dedup.Dedup.oracles ++
    dedup.SubstrDedup.oracles ++
    similarity.Knn.oracles ++
    graph.PageRank.oracles ++
    graph.LabelProp.oracles ++
    graph.Triangles.oracles ++
    operators.Integrity.oracles ++
    operators.Search.oracles ++
    operators.Stats.oracles ++
    operators.Trend.oracles ++
    operators.Pii.oracles ++
    multimodal.BinaryPipeline.oracles
}
