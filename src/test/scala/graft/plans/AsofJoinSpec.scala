package graft.plans

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential + edge-case coverage for the native as-of join
  * ([[AsofJoinPlan]] / [[AsofJoinExec]]) before it backs any gate query.
  *
  * The oracle is the pair-materializing formulation the operator exists
  * to avoid: left-outer range join on `key = key AND rt <= lt`, then
  * keep the max-(rt, tiebreak) candidate per left row. O(n·m) per key —
  * fine at spec scale, and unambiguous about every semantic the merge
  * pass hand-implements (unmatched rows, ties, NULL keys/times).
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("matches pair-join oracle on random multi-partition data") {
    val rnd = new Random(7)
    val trades = (0 until 400).map { i =>
      (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong)
    }.toDF("trade_id", "sym", "t").repartition(7)
    val quotes = (0 until 300).map { i =>
      (1000L + i, rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100))
    }.toDF("quote_id", "q_sym", "q_t", "px").repartition(5)

    val got = AsofJoinOps.asofJoin(
      trades, quotes, Seq("sym" -> "q_sym"), "t", "q_t", Seq("quote_id"))

    // oracle: every (trade, quote) pair in-key with q_t <= t, max (q_t, quote_id)
    val cand = trades.join(quotes, $"sym" === $"q_sym" && $"q_t" <= $"t", "left")
    val w = Window.partitionBy($"trade_id").orderBy($"q_t".desc_nulls_last, $"quote_id".desc_nulls_last)
    val want = cand.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")

    assert(sortedRows(got) == sortedRows(want))
    assert(got.count() == 400) // left rows pass through 1:1
  }

  test("unmatched left rows emit NULL for non-nullable right columns") {
    // right side built from spark.range: id is non-nullable, so a result
    // projection bound against the ORIGINAL right attrs would skip null
    // checks and emit 0 instead of NULL for unmatched rows (the round-2
    // ADVICE bug). A string column rides along to catch the NPE variant.
    val left = Seq((1L, 10L), (1L, 5L), (2L, 50L)).toDF("k", "t")
    val right = spark.range(3).select(
      $"id", lit(1L).as("rk"), ($"id" * 10 + 7).as("rt"),
      concat(lit("v"), $"id").as("tag"))
    // rk=1 rows at rt ∈ {7, 17, 27}: (1, t=10) matches id=0; (1, t=5)
    // has no quote at-or-before; k=2 has no right rows at all
    val got = AsofJoinOps.asofJoin(
      left, right, Seq("k" -> "rk"), "t", "rt", Seq("id")).collect()
    val byRow = got.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap

    val hit = byRow((1L, 10L))
    assert(hit.getLong(2) == 0L && hit.getString(5) == "v0")
    val missTime = byRow((1L, 5L))
    assert(missTime.isNullAt(2) && missTime.isNullAt(3) && missTime.isNullAt(4) && missTime.isNullAt(5))
    val missKey = byRow((2L, 50L))
    assert(missKey.isNullAt(2) && missKey.isNullAt(5))
  }

  test("equal-timestamp ties: rt == lt matches, greatest tiebreak wins") {
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq(
      (10L, 1L, 100L, "first"), (11L, 1L, 100L, "second"), (12L, 1L, 101L, "late"))
      .toDF("qid", "rk", "rt", "tag")
    val got = AsofJoinOps.asofJoin(
      left, right, Seq("k" -> "rk"), "t", "rt", Seq("qid")).collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == 11L && got.head.getString(5) == "second")
  }

  test("NULL keys and NULL times never match") {
    val left = Seq(
      (Some(1L), Some(100L), "ok"),
      (None: Option[Long], Some(100L), "null_key"),
      (Some(1L), None: Option[Long], "null_time")
    ).toDF("k", "t", "side")
    val right = Seq(
      (Some(1L), Some(50L), 900L),
      (None: Option[Long], Some(40L), 901L), // NULL right key: matches nothing
      (Some(1L), None: Option[Long], 902L)   // NULL right time: matches nothing
    ).toDF("rk", "rt", "qid")
    val got = AsofJoinOps.asofJoin(
      left, right, Seq("k" -> "rk"), "t", "rt", Seq("qid")).collect()
    val bySide = got.map(r => r.getString(2) -> r).toMap
    assert(bySide("ok").getLong(5) == 900L)
    assert(bySide("null_key").isNullAt(5))
    assert(bySide("null_time").isNullAt(5))
    assert(got.length == 3)
  }

  test("self-join (shared exprIds) re-aliases the right side") {
    val ev = Seq((1L, 1L, 10L), (2L, 1L, 20L), (3L, 2L, 5L)).toDF("id", "k", "t")
    // each row joined to the latest row (incl. itself) at-or-before its t
    val got = AsofJoinOps.asofJoin(
      ev, ev.toDF("r_id", "r_k", "r_t"), Seq("k" -> "r_k"), "t", "r_t", Seq("r_id"))
      .select($"id", $"r_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("plan: AsofJoinExec with hash exchanges; sorted input elides none extra") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, 0L)).toDF("rk", "rt", "qid")
    val df = AsofJoinOps.asofJoin(left, right, Seq("k" -> "rk"), "t", "rt", Seq("qid"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"))
    // EnsureRequirements materialized the ClusteredDistribution + sort
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2)
    assert(plan.contains("Sort ["))
  }
}
