package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ONE per-key overlap counter behind every recall meter (r17
  * optimization). Every meter compares two top sets — exact vs
  * approximate (key, item) rows — and used to do it as three separate
  * aggregates (each side's count + a left-semi intersection), which
  * evaluated EACH side's full scoring pass twice per run. This form
  * union-tags the two sides and counts both sizes and the intersection
  * in ONE aggregation: each arm's plan is evaluated exactly once, the
  * two arms run as parallel subtrees of the same job, and nothing is
  * re-joined against anything.
  *
  * Row membership matches the two join shapes the meters used:
  * `requireRight = true` reproduces the inner count-join (keys present
  * in BOTH sides), `false` the left form (keys with a left-side row;
  * right count coalesces to 0). Sides must be (key, item)-distinct —
  * every caller's top-k/match frames are, by construction.
  */
object Overlap {

  def counts(ex: DataFrame, ap: DataFrame, key: String, item: String,
      exName: String, apName: String, requireRight: Boolean): DataFrame = {
    val u = ex.select(col(key), col(item))
      .withColumn("_ex", lit(1)).withColumn("_ap", lit(0))
      .unionByName(ap.select(col(key), col(item))
        .withColumn("_ex", lit(0)).withColumn("_ap", lit(1)))
    val flags = u.groupBy(col(key), col(item))
      .agg(max(col("_ex")).as("_ex"), max(col("_ap")).as("_ap"))
    val cnt = flags.groupBy(col(key))
      .agg(sum(col("_ex")).as(exName), sum(col("_ap")).as(apName),
        sum(col("_ex") * col("_ap")).as("n_common"))
    val kept = if (requireRight)
      cnt.filter(col(exName) > 0 && col(apName) > 0)
    else cnt.filter(col(exName) > 0)
    kept.select(col(key), col(exName), col(apName), col("n_common"))
  }
}
