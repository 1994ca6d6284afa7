package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one implemented operator/capability from SURVEY.md §2;
  * `oracleSql` holds the equivalent DuckDB SQL for the driver's hash-compare
  * (omitted only for operators whose hashes are engine-specific, e.g. minhash).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1_agg(spark, "/root/testdata/sf0.001")

  private val bundles: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.Relational.queries, operators.Relational.oracles),
      (operators.Relational2.queries, operators.Relational2.oracles),
      (operators.SpatialIndex.queries, operators.SpatialIndex.oracles),
      (operators.Tpch.queries, operators.Tpch.oracles),
      (operators.Tpch2.queries, operators.Tpch2.oracles),
      (operators.Tpcds.queries, operators.Tpcds.oracles),
      (operators.Tpcds2.queries, operators.Tpcds2.oracles),
      (operators.Tpcds3.queries, operators.Tpcds3.oracles),
      (operators.Tpcds4.queries, operators.Tpcds4.oracles),
      (operators.Tpcds5.queries, operators.Tpcds5.oracles),
      (operators.Tpcds6.queries, operators.Tpcds6.oracles),
      (operators.Tpcds7.queries, operators.Tpcds7.oracles),
      (operators.Aggregates.queries, operators.Aggregates.oracles),
      (operators.Aggregates2.queries, operators.Aggregates2.oracles),
      (operators.SetOps.queries, operators.SetOps.oracles),
      (operators.Sorts.queries, operators.Sorts.oracles),
      (operators.Windows.queries, operators.Windows.oracles),
      (operators.Patterns.queries, operators.Patterns.oracles),
      (operators.Events.queries, operators.Events.oracles),
      (operators.Functions.queries, operators.Functions.oracles),
      (operators.Functions2.queries, operators.Functions2.oracles),
      (operators.Functions3.queries, operators.Functions3.oracles),
      (operators.Functions4.queries, operators.Functions4.oracles),
      (operators.Functions5.queries, operators.Functions5.oracles),
      (operators.Geometry.queries, operators.Geometry.oracles),
      (operators.Geometry2.queries, operators.Geometry2.oracles),
      (operators.Stats.queries, operators.Stats.oracles),
      (operators.Dedup.queries, operators.Dedup.oracles),
      (operators.Similarity.queries, operators.Similarity.oracles),
      (operators.TextAnalysis.queries, operators.TextAnalysis.oracles),
      (operators.TextPipeline.queries, operators.TextPipeline.oracles),
      (operators.Sampling.queries, operators.Sampling.oracles),
      (operators.EmbeddingOps.queries, operators.EmbeddingOps.oracles),
      (operators.Multimodal.queries, operators.Multimodal.oracles),
      (operators.Ml.queries, operators.Ml.oracles),
      (operators.Ai.queries, operators.Ai.oracles),
      (operators.Approx.queries, operators.Approx.oracles),
      (operators.Types.queries, operators.Types.oracles),
      (operators.Federation.queries, operators.Federation.oracles),
      (operators.DeltaQueries.queries, operators.DeltaQueries.oracles),
      (operators.IcebergQueries.queries, operators.IcebergQueries.oracles),
      (operators.HudiQueries.queries, operators.HudiQueries.oracles),
      (operators.HiveQueries.queries, operators.HiveQueries.oracles),
      (operators.HttpQueries.queries, operators.HttpQueries.oracles),
      (operators.LakehouseQueries.queries, operators.LakehouseQueries.oracles),
      (operators.HttpCatalogQueries.queries, operators.HttpCatalogQueries.oracles),
      (operators.Dialect.queries, operators.Dialect.oracles),
      (operators.Misc.queries, operators.Misc.oracles))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    bundles.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    bundles.map(_._2).reduce(_ ++ _)
}
