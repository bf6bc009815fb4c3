package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every `queries` key with
  * an entry in `oracleSql` is hash-checked against DuckDB at sf0.01;
  * keys without one get a weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.RelationalQueries.q1_pricing_summary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.RelationalQueries.queries ++ ops.ConverterQueries.queries ++
      ops.SimilarityOps.queries ++ ops.DedupOps.queries ++ ops.TextOps.queries ++
      ops.MultimodalOps.queries ++ ops.PipelineOps.queries ++
      streaming.StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.RelationalQueries.oracles ++ ops.ConverterQueries.oracles ++
      ops.SimilarityOps.oracles ++ ops.DedupOps.oracles ++ ops.TextOps.oracles ++
      ops.MultimodalOps.oracles ++ ops.PipelineOps.oracles ++
      streaming.StreamingOps.oracles
}
