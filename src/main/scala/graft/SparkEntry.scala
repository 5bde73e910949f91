package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-area query inventories; every entry in [[queries]]
  * is an operator from SURVEY.md §2 expressed through the engine's
  * public surface, and every key present in [[oracleSql]] is
  * hash-compared against DuckDB by the driver at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.WindowQueries.queries ++
      graft.queries.RelQueries.queries ++
      graft.queries.LlmQueries.queries ++
      graft.queries.EmaFamilyQueries.queries ++
      graft.queries.FluxQueries.queries ++
      graft.queries.InfluxQlQueries.queries ++
      graft.queries.SetOpQueries.queries ++
      graft.queries.MiningQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.TpchQueries.queries ++
      graft.queries.GraphQueries.queries ++
      graft.queries.StreamingQueries.queries

  /** Entries that exercise the streaming machinery end-to-end: part of
    * the correctness gate, but excluded from [[Bench]] — they measure
    * micro-batch orchestration (checkpoints, temp warehouses), not
    * query-plan throughput, and their setup noise would swamp the
    * per-query timings the bench exists to compare.
    */
  def streamingOnly: Set[String] = graft.queries.StreamingQueries.queries.keySet

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++
      graft.queries.WindowQueries.oracle ++
      graft.queries.RelQueries.oracle ++
      graft.queries.LlmQueries.oracle ++
      graft.queries.EmaFamilyQueries.oracle ++
      graft.queries.FluxQueries.oracle ++
      graft.queries.InfluxQlQueries.oracle ++
      graft.queries.SetOpQueries.oracle ++
      graft.queries.MiningQueries.oracle ++
      graft.queries.AnalyticsQueries.oracle ++
      graft.queries.TpchQueries.oracle ++
      graft.queries.GraphQueries.oracle ++
      graft.queries.StreamingQueries.oracle
}
