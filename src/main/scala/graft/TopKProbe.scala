package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures what [[graft.plans.WindowTopKRewrite]] buys: the same
  * window-top-k query executed (a) as written — row_number window with
  * Spark's own InferWindowGroupLimit optimization — and (b) with the
  * rewrite installed, which replaces window+sort+full-row shuffle with
  * the GroupedTopK partial aggregate. Run:
  *
  *   sbt "runMain graft.TopKProbe 20000000 100000"
  *
  * Prints one JSON line per variant (min of 2 runs).
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val groups = args.lift(1).map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic synthetic: g in [0, groups), score genuinely
    // pseudo-random via xxhash64 (a multiplicative "hash" never wraps at
    // these magnitudes and would leave score monotone in id — a
    // degenerate best/worst case for the two plans). score must stay
    // NON-NULLABLE for the rewrite's guard, so no Divide/Remainder in
    // its lineage (Spark marks those nullable regardless of operands).
    def base = spark.range(rows).select(
      ($"id" % groups).as("g"),
      xxhash64($"id").cast("double").as("score"),
      $"id")

    def query = {
      val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
      base.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 5)
        .select($"g", $"rn", $"id", $"score")
    }

    def time(label: String): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        val n = query.count()
        val sec = (System.nanoTime() - t0) / 1e9
        require(n == groups * 5, s"unexpected row count $n")
        sec
      }
      val sec = math.min(once(), once())
      val plan = query.queryExecution.executedPlan.toString
      val shape = if (plan.contains("grouped_topk")) "grouped_topk" else "window"
      println(f"""{"probe": "$label", "shape": "$shape", "rows": $rows, "groups": $groups, "sec": $sec%.2f}""")
    }

    time("window_form")
    spark.experimental.extraOptimizations = Seq(graft.plans.WindowTopKRewrite)
    spark.conf.set(graft.plans.WindowTopKRewrite.EnabledKey, "true")
    time("with_rewrite")
    spark.stop()
  }
}
