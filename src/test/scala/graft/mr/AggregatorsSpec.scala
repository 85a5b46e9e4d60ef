package graft.mr

import graft.SparkSpec
import graft.core.KV

/** The algebraic (partial-agg) path must agree with the generic
  * materialize-all-values path, and its plan must actually pre-combine
  * before the shuffle.
  */
class AggregatorsSpec extends SparkSpec {

  private def corpus = Seq(
    ("f1", "a b a c a"),
    ("f2", "b b c d"),
    ("f3", "a d d"))

  test("algebraic wordcount equals the generic engine's wordcount") {
    import spark.implicits._
    val input = spark.createDataset(corpus).repartition(3)
    val generic = MapReduce.run(input, Apps.WordCount.map, Apps.WordCount.reduce)
      .collect().map(kv => kv.key -> kv.value.toLong).toMap
    val algebraic = Aggregators
      .runAlgebraic(input, Apps.WordCount.map, Aggregators.countValues.toColumn)
      .collect().toMap
    assert(algebraic == generic)
    assert(algebraic == Map("a" -> 4L, "b" -> 3L, "c" -> 2L, "d" -> 3L))
  }

  test("the aggregator plan pre-combines before the shuffle (partial aggregation)") {
    import spark.implicits._
    val input = spark.createDataset(corpus)
    val plan = Aggregators
      .runAlgebraic(input, Apps.WordCount.map, Aggregators.countValues.toColumn)
      .queryExecution.executedPlan.toString
    // partial + final typed aggregation around the exchange
    val aggCount = "(?i)aggregate".r.findAllIn(plan).size
    assert(plan.contains("Exchange"), plan)
    assert(aggCount >= 2, s"expected partial+final aggregate nodes:\n$plan")
  }

  test("longest-value reducer works through the algebraic path") {
    import spark.implicits._
    val input = spark.createDataset(Seq(("f", "x")))
    val out = Aggregators.runAlgebraic(
      input,
      (_, _) => Seq(KV("k", "aa"), KV("k", "cccc"), KV("k", "b")),
      Aggregators.longestValue.toColumn).collect().toMap
    assert(out == Map("k" -> "cccc"))
  }
}
