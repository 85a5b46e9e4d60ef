package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The window-top-k → bounded-heap rewrite: fires on the exact eligible
  * pattern, produces identical results, and leaves ineligible plans
  * alone.
  */
class WindowTopKRewriteSpec extends SparkSpec {

  import spark.implicits._

  /** (group, ord, id) rows with deterministic content; case-class typed
    * so ord/id are non-nullable primitives (an eligibility condition).
    */
  private def data: DataFrame =
    (1 to 400).map { i =>
      (i % 7L, ((i * 37) % 101).toDouble, i.toLong)
    }.toDF("g", "score", "id")

  private def windowTopK(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"g", $"rn", $"id", $"score")
  }

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations = Seq(WindowTopKRewrite)
    spark.conf.set(WindowTopKRewrite.EnabledKey, "true")
    try body
    finally {
      spark.conf.unset(WindowTopKRewrite.EnabledKey)
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("the rule is config-gated: installed but disabled leaves plans alone") {
    spark.experimental.extraOptimizations = Seq(WindowTopKRewrite)
    try {
      val plan = windowTopK(data, 3).queryExecution.executedPlan.toString
      assert(plan.contains("Window") && !plan.contains("grouped_topk"))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("eligible pattern rewrites to grouped_topk and drops the Window") {
    val expected = windowTopK(data, 3).collect().toSet
    withRule {
      val df = windowTopK(data, 3)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("grouped_topk"), plan.take(2000))
      assert(!plan.contains("Window"), plan.take(2000))
      assert(df.collect().toSet == expected)
    }
  }

  test("rn < k form and projection reorders/drops are handled") {
    val expected = windowTopK(data, 4).select($"id", $"g").collect().toSet
    withRule {
      val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
      val df = data.withColumn("rn", row_number().over(w))
        .filter($"rn" < 5)
        .select($"id", $"g")
      assert(df.queryExecution.executedPlan.toString.contains("grouped_topk"))
      assert(df.collect().toSet == expected)
    }
  }

  test("ineligible patterns are left alone") {
    withRule {
      // ascending ord: not the heap's order
      val wAsc = Window.partitionBy($"g").orderBy($"score".asc, $"id")
      val asc = data.withColumn("rn", row_number().over(wAsc))
        .filter($"rn" <= 3).select($"g", $"id")
      assert(asc.queryExecution.executedPlan.toString.contains("Window"))

      // projection needs a column the aggregate cannot carry
      val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
      val extra = data.withColumn("payload", $"id" * 2)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3).select($"g", $"id", $"payload")
      assert(extra.queryExecution.executedPlan.toString.contains("Window"))

      // nullable ord (when() introduces nullability): window ranks nulls,
      // the heap skips them — must not rewrite
      val nullable = data
        .withColumn("score", when($"id" =!= 0L, $"score"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3).select($"g", $"id")
      assert(nullable.queryExecution.executedPlan.toString.contains("Window"))

      // rank() instead of row_number(): different tie semantics
      val wr = data.withColumn("rn", rank().over(w))
        .filter($"rn" <= 3).select($"g", $"id")
      assert(wr.queryExecution.executedPlan.toString.contains("Window"))
    }
  }

  test("results match the window form on duplicate-heavy ties") {
    // many identical (ord) values per group: ties break by id on both
    // paths, so the k chosen rows are identical as VALUE SETS
    val dups = (1 to 300).map(i => (i % 5L, (i % 3).toDouble, i.toLong))
      .toDF("g", "score", "id")
    val expected = windowTopK(dups, 6).collect().toSet
    withRule {
      val got = windowTopK(dups, 6)
      assert(got.queryExecution.executedPlan.toString.contains("grouped_topk"))
      assert(got.collect().toSet == expected)
    }
  }

  test("GraftExtensions wires the rule into injectOptimizerRule") {
    // structural check: applying the extensions object to a fresh
    // SparkSessionExtensions registers exactly one optimizer rule build
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val rules = org.apache.spark.sql.GraftBridge.buildOptimizerRules(ext, spark)
    assert(rules.contains(WindowTopKRewrite))
  }
}
