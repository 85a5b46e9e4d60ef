package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query in the library takes `(SparkSession, sfDir)` and resolves
  * tables through here, so filters/projections stay declarative and reach
  * the parquet scan (predicate pushdown + column pruning).
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as long (legacy conf, set at
    * session build — see [[Tables.requiredConfs]]) and floor to
    * microseconds — exactly what DuckDB does when it reads the same file,
    * so oracle comparisons line up.
    */
  def events: DataFrame = {
    require(
      spark.conf.getOption(Tables.NanosAsLong).contains("true"),
      s"set ${Tables.NanosAsLong}=true at session build (Tables.requiredConfs)")
    table("events").withColumn(
      "ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  val NanosAsLong = "spark.sql.legacy.parquet.nanosAsLong"

  /** Session-build confs the table loaders rely on. Apply with
    * `requiredConfs.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }`
    * — mutating the session conf inside a getter was a side effect that
    * surprised callers, so it lives here instead.
    */
  val requiredConfs: Map[String, String] = Map(NanosAsLong -> "true")
}
