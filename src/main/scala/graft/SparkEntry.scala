package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query module in the library. Each module exposes
  * `queries` (name → (SparkSession, sfDir) ⇒ DataFrame) and `oracle`
  * (name → equivalent DuckDB SQL over the same parquet tables); modules
  * without a SQL-expressible oracle contribute queries only (the driver
  * then records a weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Analytics.queries ++
      graft.queries.MrQueries.queries ++
      graft.queries.TextAnalysis.queries ++
      graft.queries.Dedup.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.KvQueries.queries ++
      graft.queries.MultimodalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Analytics.oracle ++
      graft.queries.MrQueries.oracle ++
      graft.queries.TextAnalysis.oracle ++
      graft.queries.Dedup.oracle ++
      graft.queries.Similarity.oracle ++
      graft.queries.KvQueries.oracle ++
      graft.queries.MultimodalQueries.oracle
}
