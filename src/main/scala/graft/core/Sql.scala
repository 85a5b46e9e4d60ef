package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point: registers every test table (TESTDATA.md) as a temp
  * view so users can drive the engine with `spark.sql(...)` text — the
  * same queries the DataFrame API expresses run verbatim through
  * Catalyst's SQL front end (including the custom `fnv1a32` function).
  */
object Sql {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register all tables for `sfDir` as temp views + custom functions.
    * Returns the session for chaining.
    */
  def register(s: SparkSession, dir: String): SparkSession = {
    val t = Tables(s, dir)
    TableNames.foreach {
      case "events" => t.events.createOrReplaceTempView("events")
      case n        => t.table(n).createOrReplaceTempView(n)
    }
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv1a32", exprs => graft.functions.Fnv1a32(exprs.head), "scala_udf")
    s
  }

  def sql(s: SparkSession, dir: String, query: String): DataFrame = {
    register(s, dir)
    s.sql(query)
  }
}
