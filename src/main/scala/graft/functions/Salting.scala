package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the hand-rolled fallback where AQE's
  * skew-join splitting does not apply (first-class at 100 TB, where one
  * hot join/grouping key otherwise pins a single reducer).
  *
  * - [[saltedJoin]]: the big (skewed) side gets a per-row salt in
  *   [0, n); the small side is replicated once per salt value; the join
  *   key becomes (key, salt), spreading each hot key over n reducers.
  *   Result set is identical to the unsalted join.
  * - [[saltedCollectList]]: two-phase non-algebraic aggregation —
  *   partial collect per (key, salt), then flatten per key. Algebraic
  *   aggregates don't need this (Catalyst's partial aggregation already
  *   pre-combines); collect_list/collect_set do, because their partial
  *   states are as big as their inputs.
  */
object Salting {

  /** Deterministic per-row salt in [0, n): hash of the whole row's
    * values (stable for a given row, uniform across rows).
    */
  private def rowSalt(df: DataFrame, n: Int): Column =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(n))

  /** Join `big` (skewed) with `small` on `key`, salted n ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int): DataFrame = {
    val b = big.withColumn("__salt", rowSalt(big, n))
    val s = small
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** collect_list(valueCol) per key, salted n ways (unordered, like
    * collect_list itself).
    */
  def saltedCollectList(df: DataFrame, key: String, valueCol: String, n: Int): DataFrame =
    df.withColumn("__salt", rowSalt(df, n))
      .groupBy(col(key), col("__salt"))
      .agg(collect_list(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(flatten(collect_list(col("__partial"))).as(s"${valueCol}s"))
}
