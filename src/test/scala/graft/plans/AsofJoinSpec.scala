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

  test("forward direction matches the pair-join oracle on random multi-partition data") {
    val rnd = new Random(13)
    val trades = (0 until 400).map { i =>
      (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong)
    }.toDF("trade_id", "sym", "t").repartition(7)
    val quotes = (0 until 300).map { i =>
      (1000L + i, rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100))
    }.toDF("quote_id", "q_sym", "q_t", "px").repartition(5)

    val got = AsofJoinOps.asofJoin(
      trades, quotes, Seq("sym" -> "q_sym"), "t", "q_t", Seq("quote_id"),
      direction = AsofDirection.Forward)

    // oracle: every in-key pair with q_t >= t, min (q_t, quote_id)
    val cand = trades.join(quotes, $"sym" === $"q_sym" && $"q_t" >= $"t", "left")
    val w = Window.partitionBy($"trade_id")
      .orderBy($"q_t".asc_nulls_last, $"quote_id".asc_nulls_last)
    val want = cand.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")

    assert(sortedRows(got) == sortedRows(want))
    assert(got.count() == 400)
  }

  test("forward ties: rt == lt matches, SMALLEST tiebreak wins (mirror of backward)") {
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq(
      (10L, 1L, 100L, "first"), (11L, 1L, 100L, "second"),
      (12L, 1L, 101L, "late"), (9L, 1L, 99L, "early"))
      .toDF("qid", "rk", "rt", "tag")
    val got = AsofJoinOps.asofJoin(
      left, right, Seq("k" -> "rk"), "t", "rt", Seq("qid"),
      direction = AsofDirection.Forward).collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == 10L && got.head.getString(5) == "first")
  }

  test("forward: NULL keys/times never match; NULL right times are skipped over") {
    val left = Seq(
      (Some(1L), Some(100L), "ok"),
      (None: Option[Long], Some(100L), "null_key"),
      (Some(1L), None: Option[Long], "null_time")
    ).toDF("k", "t", "side")
    val right = Seq(
      (Some(1L), None: Option[Long], 902L), // NULL right time: never matches
      (Some(1L), Some(150L), 900L),
      (None: Option[Long], Some(140L), 901L) // NULL right key: matches nothing
    ).toDF("rk", "rt", "qid")
    val got = AsofJoinOps.asofJoin(
      left, right, Seq("k" -> "rk"), "t", "rt", Seq("qid"),
      direction = AsofDirection.Forward).collect()
    val bySide = got.map(r => r.getString(2) -> r).toMap
    assert(bySide("ok").getLong(5) == 900L)
    assert(bySide("null_key").isNullAt(5))
    assert(bySide("null_time").isNullAt(5))
    assert(got.length == 3)
  }

  test("nearest direction matches the pair-join oracle on random multi-partition data") {
    val rnd = new Random(29)
    val trades = (0 until 400).map { i =>
      (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong)
    }.toDF("trade_id", "sym", "t").repartition(7)
    val quotes = (0 until 300).map { i =>
      (1000L + i, rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100))
    }.toDF("quote_id", "q_sym", "q_t", "px").repartition(5)

    val got = AsofJoinOps.asofJoin(
      trades, quotes, Seq("sym" -> "q_sym"), "t", "q_t", Seq("quote_id"),
      direction = AsofDirection.Nearest)

    // oracle: ALL in-key pairs ranked by |q_t − t|, then side (at-or-
    // before first), then the side's own tie rule (backward greatest
    // tiebreak, forward smallest)
    val cand = trades.join(quotes, $"sym" === $"q_sym", "left")
    val w = Window.partitionBy($"trade_id").orderBy(
      abs($"q_t" - $"t").asc_nulls_last,
      when($"q_t" <= $"t", 0).otherwise(1).asc_nulls_last,
      when($"q_t" <= $"t", -$"quote_id").otherwise($"quote_id").asc_nulls_last)
    val want = cand.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")

    assert(sortedRows(got) == sortedRows(want))
    assert(got.count() == 400)
  }

  test("nearest: equal distance prefers the at-or-before candidate") {
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq(
      (10L, 1L, 95L, "before"), (11L, 1L, 105L, "after"))
      .toDF("qid", "rk", "rt", "tag")
    val got = AsofJoinOps.asofJoin(
      left, right, Seq("k" -> "rk"), "t", "rt", Seq("qid"),
      direction = AsofDirection.Nearest).collect()
    assert(got.length == 1)
    assert(got.head.getString(5) == "before", "tie at distance 5 must go backward")

    // strictly closer forward candidate wins
    val right2 = Seq(
      (10L, 1L, 90L, "before"), (11L, 1L, 105L, "after"))
      .toDF("qid", "rk", "rt", "tag")
    val got2 = AsofJoinOps.asofJoin(
      left, right2, Seq("k" -> "rk"), "t", "rt", Seq("qid"),
      direction = AsofDirection.Nearest).collect()
    assert(got2.head.getString(5) == "after")
  }

  test("nearest: NaN right time never beats a finite backward match") {
    // NaN sorts after every real double, so a NaN-time row becomes the
    // forward candidate; the distance pick must treat its NaN distance as
    // +infinity (naive `lt - bt <= ft - lt` is false for NaN ft and used
    // to select the NaN-time row over the finite backward match)
    val left = Seq((1L, 100.0)).toDF("k", "t")
    val right = Seq(
      (10L, 1L, 90.0, "real_before"), (11L, 1L, Double.NaN, "nan_after"))
      .toDF("qid", "rk", "rt", "tag")
    val got = AsofJoinOps.asofJoin(
      left, right, Seq("k" -> "rk"), "t", "rt", Seq("qid"),
      direction = AsofDirection.Nearest).collect()
    assert(got.length == 1)
    assert(got.head.getString(5) == "real_before",
      "finite backward match must beat the NaN-time forward candidate")
  }

  test("nearest: one-sided keys match from whichever side exists") {
    val left = Seq((1L, 100L, "only_after"), (2L, 100L, "only_before"), (3L, 100L, "none"))
      .toDF("k", "t", "side")
    val right = Seq((10L, 1L, 200L), (11L, 2L, 50L))
      .toDF("qid", "rk", "rt")
    val got = AsofJoinOps.asofJoin(
      left, right, Seq("k" -> "rk"), "t", "rt", Seq("qid"),
      direction = AsofDirection.Nearest).collect()
    val bySide = got.map(r => r.getString(2) -> r).toMap
    assert(bySide("only_after").getLong(3) == 10L)
    assert(bySide("only_before").getLong(3) == 11L)
    assert(bySide("none").isNullAt(3))
  }

  test("nearest rejects a non-subtractable time type at plan construction") {
    val left = Seq(("a", "2024-01-01")).toDF("k", "t")
    val right = Seq(("a", "2024-01-02", 1L)).toDF("rk", "rt", "qid")
    val e = intercept[IllegalArgumentException] {
      AsofJoinOps.asofJoin(left, right, Seq("k" -> "rk"), "t", "rt", Seq("qid"),
        direction = AsofDirection.Nearest)
    }
    assert(e.getMessage.contains("nearest"), e.getMessage)
    // backward on the same string times is fine (ordering is enough)
    assert(AsofJoinOps.asofJoin(left, right, Seq("k" -> "rk"), "t", "rt",
      Seq("qid")).count() == 1)
  }

  test("strict mode (allowExactMatches=false): equal-time rows do not match") {
    val left = Seq((1L, 100L), (1L, 101L)).toDF("k", "t")
    val right = Seq(
      (10L, 1L, 100L, "at"), (9L, 1L, 99L, "before"))
      .toDF("qid", "rk", "rt", "tag")
    val got = AsofJoinOps.asofJoin(
      left, right, Seq("k" -> "rk"), "t", "rt", Seq("qid"),
      allowExactMatches = false).collect()
      .map(r => r.getLong(1) -> r.getString(5)).toMap
    assert(got(100L) == "before", "rt == lt must not match in strict mode")
    // the equal-time row is still a valid STRICT match for the later left
    assert(got(101L) == "at")

    // forward strict: rt == lt skipped, the next later row matches
    val fwd = AsofJoinOps.asofJoin(
      left, right.union(Seq((12L, 1L, 105L, "later")).toDF("qid", "rk", "rt", "tag")),
      Seq("k" -> "rk"), "t", "rt", Seq("qid"),
      direction = AsofDirection.Forward, allowExactMatches = false).collect()
      .map(r => r.getLong(1) -> r.getString(5)).toMap
    assert(fwd(100L) == "later")
  }

  test("strict mode matches the pair-join oracle on random data") {
    val rnd = new Random(41)
    val trades = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt(15).toLong, rnd.nextInt(200).toLong)
    }.toDF("trade_id", "sym", "t").repartition(5)
    val quotes = (0 until 300).map { i =>
      (1000L + i, rnd.nextInt(18).toLong, rnd.nextInt(200).toLong, rnd.nextInt(100))
    }.toDF("quote_id", "q_sym", "q_t", "px").repartition(4)
    val got = AsofJoinOps.asofJoin(
      trades, quotes, Seq("sym" -> "q_sym"), "t", "q_t", Seq("quote_id"),
      allowExactMatches = false)
    val cand = trades.join(quotes, $"sym" === $"q_sym" && $"q_t" < $"t", "left")
    val w = Window.partitionBy($"trade_id")
      .orderBy($"q_t".desc_nulls_last, $"quote_id".desc_nulls_last)
    val want = cand.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
    assert(sortedRows(got) == sortedRows(want))
  }

  test("tolerance nulls out-of-window matches without changing selection") {
    val left = Seq((1L, 100L, "near"), (1L, 500L, "far"), (2L, 100L, "none"))
      .toDF("k", "t", "side")
    val right = Seq((10L, 1L, 95L)).toDF("qid", "rk", "rt")
    val got = AsofJoinOps.asofJoin(
      left, right, Seq("k" -> "rk"), "t", "rt", Seq("qid"),
      tolerance = Some(50.0)).collect()
    val bySide = got.map(r => r.getString(2) -> r).toMap
    assert(bySide("near").getLong(3) == 10L)     // |100-95| <= 50
    assert(bySide("far").isNullAt(3))            // matched then gated out
    assert(bySide("none").isNullAt(3))           // never matched
    assert(got.length == 3)
  }

  test("nearest with allowExactMatches=false is rejected at construction") {
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((10L, 1L, 95L)).toDF("qid", "rk", "rt")
    val e = intercept[IllegalArgumentException] {
      AsofJoinOps.asofJoin(left, right, Seq("k" -> "rk"), "t", "rt", Seq("qid"),
        direction = AsofDirection.Nearest, allowExactMatches = false)
    }
    assert(e.getMessage.contains("Nearest"), e.getMessage)
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

  test("bucketed both sides on the key: zero Exchange (the claimed elision)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_asof_bucket").toString
    try {
      (1 to 5000).map(i => (i.toLong % 50, i.toLong, s"L$i")).toDF("k", "t", "l")
        .write.bucketBy(8, "k").sortBy("k", "t")
        .option("path", s"$tmp/lt").saveAsTable("graft_asof_l")
      (1 to 2000).map(i => (i.toLong % 50, (i * 2).toLong, i.toLong)).toDF("rk", "rt", "qid")
        .write.bucketBy(8, "rk").sortBy("rk", "rt")
        .option("path", s"$tmp/rt").saveAsTable("graft_asof_r")
      val lt = spark.table("graft_asof_l")
      val rt = spark.table("graft_asof_r")
      val got = AsofJoinOps.asofJoin(lt, rt, Seq("k" -> "rk"), "t", "rt", Seq("qid"))
      val plan = got.queryExecution.executedPlan.toString
      assert(plan.contains("AsofJoin"))
      // ClusteredDistribution is satisfied by the bucketed scans' hash
      // partitioning (8 buckets, same key both sides): no shuffle at all
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      // and the merge still computes the right answer on bucketed input
      val cand = lt.join(rt, $"k" === $"rk" && $"rt" <= $"t", "left")
      val w = Window.partitionBy($"k", $"t", $"l")
        .orderBy($"rt".desc_nulls_last, $"qid".desc_nulls_last)
      val want = cand.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
      assert(sortedRows(got) == sortedRows(want))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_asof_l")
      spark.sql("DROP TABLE IF EXISTS graft_asof_r")
    }
  }

  test("AQE enabled, multi-partition: re-planned run matches the oracle") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val rnd = new Random(23)
      val trades = (0 until 500).map { i =>
        (i.toLong, rnd.nextInt(15).toLong, rnd.nextInt(800).toLong)
      }.toDF("trade_id", "sym", "t").repartition(9)
      val quotes = (0 until 350).map { i =>
        (1000L + i, rnd.nextInt(18).toLong, rnd.nextInt(800).toLong, rnd.nextInt(100))
      }.toDF("quote_id", "q_sym", "q_t", "px").repartition(6)
      val got = AsofJoinOps.asofJoin(
        trades, quotes, Seq("sym" -> "q_sym"), "t", "q_t", Seq("quote_id"))
      val cand = trades.join(quotes, $"sym" === $"q_sym" && $"q_t" <= $"t", "left")
      val w = Window.partitionBy($"trade_id")
        .orderBy($"q_t".desc_nulls_last, $"quote_id".desc_nulls_last)
      val want = cand.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
      assert(sortedRows(got) == sortedRows(want))
      // after execution the adaptive plan must still be the native merge
      assert(got.queryExecution.executedPlan.toString.contains("AsofJoin"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("un-orderable key/time types fail at plan construction") {
    val left = Seq((1L, 10L)).toDF("k", "t")
      .select(map($"k", $"t").as("mk"), $"t")
    val right = Seq((1L, 5L)).toDF("rk", "rt")
      .select(map($"rk", $"rt").as("rmk"), $"rt")
    val e = intercept[IllegalArgumentException] {
      AsofJoinOps.asofJoin(left, right, Seq("mk" -> "rmk"), "t", "rt")
    }
    assert(e.getMessage.contains("un-orderable"))
  }

  test("ambiguous column names fail loudly instead of binding first match") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, 2L)).toDF("rk", "rt", "rt2")
      .select($"rk", $"rt", $"rt2".as("rt")) // two columns named rt
    val e = intercept[IllegalArgumentException] {
      AsofJoinOps.asofJoin(left, right, Seq("k" -> "rk"), "t", "rt")
    }
    assert(e.getMessage.contains("ambiguous"))
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
