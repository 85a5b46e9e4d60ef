package graft.functions

import graft.SparkSpec

/** AQE skew-join handling: with runtime re-planning on, a pathologically
  * skewed shuffle join gets its hot partition split (the plan's join node
  * reports skew=true) and still returns exact results — the built-in
  * complement to the manual Salting utilities.
  */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits the skewed partition of a shuffle join") {
    import spark.implicits._
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // ~95% of left rows share one key; right side is uniform
      val left = spark.range(200000)
        .select(org.apache.spark.sql.functions.when($"id" % 20 === 0, $"id" % 1000)
          .otherwise(org.apache.spark.sql.functions.lit(7L)).as("k"), $"id".as("v"))
      val right = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("w"))

      val joined = left.join(right, "k")
      // execute through this exact QueryExecution so the adaptive plan
      // finalizes with runtime statistics (count() would plan separately)
      val n = joined.collect().length
      assert(n == 200000, s"join lost rows: $n")

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in plan:\n$plan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
