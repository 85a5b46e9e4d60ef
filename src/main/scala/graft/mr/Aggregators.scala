package graft.mr

import org.apache.spark.sql.{Dataset, Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

import graft.core.KV

/** Typed partial-aggregation path for algebraic reducers (SURVEY §7.3).
  *
  * The generic engine ([[MapReduce.run]]) must ship every mapped KV to
  * the reducer because `Reduce(key, []values)` is an arbitrary closure —
  * exactly the reference's physical behavior (no combiner,
  * mr/worker.go:62-64). When the reducer is algebraic (count, sum, max…)
  * an `Aggregator[IN, BUF, OUT]` declares merge-ability, so Spark plans
  * partial aggregation: each map-side task pre-combines before the
  * shuffle, turning the wc shuffle from O(tokens) into O(distinct words
  * per partition) — the combiner upgrade MapReduce '04 §4.3 describes,
  * for free from the engine.
  */
object Aggregators {

  /** count(values) — the wc reducer (mrapps/wc.go:41-44) as an
    * algebraic aggregate.
    */
  val countValues: Aggregator[KV, Long, Long] = new Aggregator[KV, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: KV): Long = b + 1
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(b: Long): Long = b
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** longest value — an example max-style algebraic reducer. */
  val longestValue: Aggregator[KV, String, String] =
    new Aggregator[KV, String, String] {
      def zero: String = ""
      def reduce(b: String, a: KV): String = if (a.value.length > b.length) a.value else b
      def merge(b1: String, b2: String): String = if (b2.length > b1.length) b2 else b1
      def finish(b: String): String = b
      def bufferEncoder: Encoder[String] = Encoders.STRING
      def outputEncoder: Encoder[String] = Encoders.STRING
    }

  /** Run a MapReduce job whose reducer is an algebraic [[Aggregator]] —
    * same dataflow as [[MapReduce.run]], but the shuffle carries partial
    * aggregates instead of raw KVs.
    */
  def runAlgebraic[OUT](
      input: Dataset[(String, String)],
      mapF: (String, String) => IterableOnce[KV],
      agg: TypedColumn[KV, OUT]): Dataset[(String, OUT)] = {
    import input.sparkSession.implicits._
    input
      .flatMap { case (k, v) => mapF(k, v) }
      .groupByKey(_.key)
      .agg(agg)
  }
}
