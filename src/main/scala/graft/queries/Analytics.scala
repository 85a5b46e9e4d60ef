package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Declarative analytics over the TPC-H-ish tables (TESTDATA.md).
  *
  * Design notes (100 TB scale):
  *  - every query is pure DataFrame API → Catalyst does predicate pushdown,
  *    column pruning and partial aggregation; `.explain` shows PushedFilters
  *    and WholeStageCodegen spans for each of these.
  *  - dimension tables (region/nation/supplier) are `broadcast()`-hinted so
  *    the fact-side join is a map-side hash join (no shuffle of lineitem).
  *  - money arithmetic is done in DECIMAL (exact, associative — safe under
  *    any aggregation order / partitioning) and cast to DOUBLE only at the
  *    end, so results are bit-identical regardless of the physical plan.
  */
object Analytics {

  /** Exact decimal view of a money/quantity column (see scaladoc above). */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def sumDec(c: Column): Column = sum(dec(c)).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan-heavy grouped aggregation with partial agg.
    "q1_agg" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.lineitem
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sumDec($"l_quantity").as("sum_qty"),
          sumDec($"l_extendedprice").as("sum_base_price"),
          sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec($"l_discount")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", $"sum_qty" / $"count_order")
        .withColumn("avg_price", $"sum_base_price" / $"count_order")
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // Global sort + limit → Spark plans TakeOrderedAndProject (top-k per
    // partition, merge on driver): no full sort, no full shuffle.
    "q_topk" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).lineitem
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        .limit(100)
    },

    // TPC-H Q3 shape: selective dim filter → fact joins → agg → top-k.
    // customer is small relative to lineitem → broadcast; orders⋈lineitem
    // is the one genuine shuffle.
    "q3_join_topk" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val cutoff = lit("1998-01-01").cast("timestamp")
      val c = t.customer.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val o = t.orders.filter($"o_orderdate" < cutoff)
        .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      val l = t.lineitem.filter($"l_shipdate" > cutoff)
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec($"l_discount")))
          .cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },

    // TPC-H Q5 shape: star join through 4 broadcast dims, one fact shuffle.
    "q5_nation_revenue" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.lineitem
        .join(t.orders.select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(t.customer.select($"c_custkey", $"c_nationkey")),
          $"o_custkey" === $"c_custkey")
        .join(broadcast(t.supplier.select($"s_suppkey", $"s_nationkey")),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(t.nation), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(t.region.filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec($"l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy($"n_name")
    },

    // Left-semi / left-anti joins (EXISTS / NOT EXISTS).
    "q_semi_anti" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val purchasers = t.events
        .filter($"event_type" === "purchase" && $"value" > 180).select($"user_id")
      val erroring = t.events
        .filter($"event_type" === "error" && $"value" > 180).select($"user_id")
      val c = t.customer
      c.join(purchasers, $"c_custkey" === $"user_id", "left_semi")
        .join(erroring, $"c_custkey" === $"user_id", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    // Window functions: rank within partition + running sum, deterministic
    // ordering via unique (ts, event_id).
    "q_window" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables(s, dir).events
        .withColumn("rn", row_number().over(w))
        .withColumn("running_value",
          sum(dec($"value")).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double"))
        .filter($"rn" <= 3)
        .select($"user_id", $"rn", $"event_id", $"running_value")
        .orderBy($"user_id", $"rn")
    },

    // Ranking/navigation window-function family over a deterministic
    // (ts, event_id) order.
    "q_window_fns" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables(s, dir).events
        .withColumn("rn", row_number().over(w))
        .withColumn("drank", dense_rank().over(
          Window.partitionBy($"user_id").orderBy($"event_type")))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("prank", round(percent_rank().over(w), 6))
        .withColumn("cdist", round(cume_dist().over(w), 6))
        .withColumn("prev_id", lag($"event_id", 1, -1L).over(w))
        .withColumn("next_id", lead($"event_id", 1, -1L).over(w))
        .filter($"rn" <= 5)
        .select($"user_id", $"rn", $"event_id", $"drank", $"quartile",
          $"prank", $"cdist", $"prev_id", $"next_id")
        .orderBy($"user_id", $"rn")
    },

    // As-of join (the canonical "operator Spark lacks"), composed from
    // existing ops per the extension preference order: tag both sides,
    // one window pass carries the latest at-or-before signup forward —
    // a single shuffle on user_id, no range join, no per-row subquery.
    "q_asof_join" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables(s, dir).events
        .filter($"event_type".isin("purchase", "signup"))
        .select($"event_id", $"user_id", $"ts", $"event_type")
        .withColumn("signup_id",
          last(when($"event_type" === "signup", $"event_id"), ignoreNulls = true)
            .over(w))
        .filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", coalesce($"signup_id", lit(-1L)).as("signup_id"))
        .orderBy($"event_id")
    },

    // CROSS-TABLE as-of join through the native operator
    // ([[graft.plans.AsofJoinExec]]): for each purchase, the latest click
    // by the same user at or before the purchase (ties toward the
    // greatest click id). The union-window trick above can't express
    // this shape when the sides differ (here: same source, but the
    // operator treats them as two independent relations — the general
    // case); the native merge does it in two shuffles with O(1) state.
    "q_asof_native" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id".as("c_user_id"),
          $"ts".as("click_ts"))
      graft.plans.AsofJoinOps.asofJoin(
          purchases, clicks, Seq("user_id" -> "c_user_id"), "ts", "click_ts",
          rightTiebreak = Seq("click_id"))
        .select($"event_id", $"user_id",
          coalesce($"click_id", lit(-1L)).as("click_id"))
        .orderBy($"event_id")
    },

    // FORWARD as-of through the same native operator: for each purchase,
    // the EARLIEST click at-or-after it (next-touch attribution) —
    // direction flips the merge, not the plan shape: same co-partitioned
    // co-sorted single pass, and forward needs no buffered match at all.
    "q_asof_forward" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id".as("c_user_id"),
          $"ts".as("click_ts"))
      graft.plans.AsofJoinOps.asofJoin(
          purchases, clicks, Seq("user_id" -> "c_user_id"), "ts", "click_ts",
          rightTiebreak = Seq("click_id"),
          direction = graft.plans.AsofDirection.Forward)
        .select($"event_id", $"user_id",
          coalesce($"click_id", lit(-1L)).as("click_id"))
        .orderBy($"event_id")
    },

    // STRICT backward (allowExactMatches=false, the pandas knob): the
    // latest click strictly before the purchase — same-instant clicks
    // no longer match. Same merge, one comparison flipped.
    "q_asof_strict" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id".as("c_user_id"),
          $"ts".as("click_ts"))
      graft.plans.AsofJoinOps.asofJoin(
          purchases, clicks, Seq("user_id" -> "c_user_id"), "ts", "click_ts",
          rightTiebreak = Seq("click_id"), allowExactMatches = false)
        .select($"event_id", $"user_id",
          coalesce($"click_id", lit(-1L)).as("click_id"))
        .orderBy($"event_id")
    },

    // Tolerance gate (pandas merge_asof tolerance): the backward match
    // is selected as usual, then NULLed when the purchase-click gap
    // exceeds one hour — a post-projection, not a second join. ts is a
    // micros timestamp, so the tolerance unit is microseconds and the
    // gap arithmetic is exact integer work.
    "q_asof_tolerance" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id".as("c_user_id"),
          $"ts".as("click_ts"))
      graft.plans.AsofJoinOps.asofJoin(
          purchases, clicks, Seq("user_id" -> "c_user_id"), "ts", "click_ts",
          rightTiebreak = Seq("click_id"),
          tolerance = Some(3600e6)) // 1 h in µs
        .select($"event_id", $"user_id",
          coalesce($"click_id", lit(-1L)).as("click_id"))
        .orderBy($"event_id")
    },

    // NEAREST direction: each purchase attaches its closest click in
    // either time direction (equal distance → the at-or-before one).
    // Same single-pass merge: the backward buffer and the merge head
    // are the two candidates, so nearest costs exactly what backward
    // does — no second scan, no pair amplification.
    "q_asof_nearest" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id".as("c_user_id"),
          $"ts".as("click_ts"))
      graft.plans.AsofJoinOps.asofJoin(
          purchases, clicks, Seq("user_id" -> "c_user_id"), "ts", "click_ts",
          rightTiebreak = Seq("click_id"),
          direction = graft.plans.AsofDirection.Nearest)
        .select($"event_id", $"user_id",
          coalesce($"click_id", lit(-1L)).as("click_id"))
        .orderBy($"event_id")
    },

    // Set operations: union / intersect / except.
    "q_setops" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      def typed(et: String) = t.events
        .filter($"event_type" === et && $"value" > 150).select($"user_id").distinct()
      val buyers   = typed("purchase")
      val clickers = typed("click")
      val signups  = typed("signup")
      buyers.intersect(clickers).except(signups)
        .union(buyers.except(clickers).except(signups))
        .distinct()
        .orderBy($"user_id")
    },

    // Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL —
    // duplicates preserved, unlike q_setops' set semantics).
    "q_setops_all" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val a = t.events.filter($"event_type" === "click").select($"user_id")
      val b = t.events.filter($"event_type" === "view").select($"user_id")
      a.intersectAll(b).groupBy($"user_id").agg(count(lit(1)).as("n_inter"))
        .join(
          a.exceptAll(b).groupBy($"user_id").agg(count(lit(1)).as("n_except")),
          Seq("user_id"), "full_outer")
        .select($"user_id",
          coalesce($"n_inter", lit(0L)).as("n_inter"),
          coalesce($"n_except", lit(0L)).as("n_except"))
        .orderBy($"user_id")
    },

    // Regexp surface: extract / replace / count over generated text.
    "q_regexp" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).customer
        .select($"c_custkey",
          regexp_extract($"c_name", "([0-9]+)", 1).as("digits"),
          regexp_replace($"c_name", "[0-9]", "#").as("masked"),
          regexp_count($"c_name", lit("[0-9]")).as("n_digits"))
        .orderBy($"c_custkey")
    },

    // Scalar function surface: string / date / math / conditional.
    "q_scalar_fns" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).orders
        .select(
          $"o_orderkey",
          upper(substring($"o_orderpriority", 1, 1)).as("prio_code"),
          year($"o_orderdate").as("o_year"),
          month($"o_orderdate").as("o_month"),
          (dec($"o_totalprice") * lit("1.10").cast("decimal(3,2)"))
            .cast("double").as("taxed"),
          when($"o_orderstatus" === "F", "done")
            .when($"o_orderstatus" === "O", "open")
            .otherwise("partial").as("status_word"),
          length($"o_orderpriority").as("prio_len"),
          concat_ws("-", $"o_orderstatus", $"o_orderpriority").as("tag"))
        .orderBy($"o_orderkey")
    },

    // Correlated EXISTS subquery, driven through the SQL text front end
    // (Catalyst decorrelates it into a left-semi join — see PLANS.md).
    "q_correlated_exists" -> { (s, dir) =>
      graft.core.Sql.sql(s, dir,
        """SELECT c_custkey, c_name FROM customer c
          |WHERE EXISTS (
          |  SELECT 1 FROM orders o
          |  WHERE o.o_custkey = c.c_custkey
          |    AND o.o_totalprice > 300000 AND YEAR(o.o_orderdate) = 1997)
          |ORDER BY c_custkey""".stripMargin)
    },

    // Sliding sum over a time RANGE frame (peers by value, not row
    // position — deterministic under ties by construction).
    "q_sliding_sum" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy(unix_timestamp($"ts"))
        .rangeBetween(-3600L, 0L)
      Tables(s, dir).events
        .withColumn("hour_sum", sum(dec($"value")).over(w).cast("double"))
        .groupBy($"user_id")
        .agg(max($"hour_sum").as("peak_hour_sum"), count(lit(1)).as("n_events"))
        .orderBy($"user_id")
    },

    // Sessionization: split each user's event stream at >30-minute
    // inactivity gaps (lag + running sum of session starts — one window
    // pass, one shuffle on user_id).
    "q_sessionize" -> { (s, dir) =>
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val sessions = Tables(s, dir).events
        .withColumn("prev_ts", lag($"ts", 1).over(byUser))
        .withColumn("new_session",
          when($"prev_ts".isNull ||
            unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_idx",
          sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      sessions
        .groupBy($"user_id", $"session_idx")
        .agg(count(lit(1)).as("n_events"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"),
          max($"n_events").as("max_session_events"))
        .orderBy($"user_id")
    },

    // Outer-join surface: full outer of two per-user aggregates with
    // null-filled sides.
    "q_outer_join" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val buys = t.events.filter($"event_type" === "purchase" && $"value" > 170)
        .groupBy($"user_id").agg(count(lit(1)).as("n_buy"))
      val errs = t.events.filter($"event_type" === "error" && $"value" > 170)
        .groupBy($"user_id").agg(count(lit(1)).as("n_err"))
      buys.toDF("u1", "n_buy")
        .join(errs.toDF("u2", "n_err"), $"u1" === $"u2", "full_outer")
        .select(coalesce($"u1", $"u2").as("user_id"),
          coalesce($"n_buy", lit(0L)).as("n_buy"),
          coalesce($"n_err", lit(0L)).as("n_err"))
        .orderBy($"user_id")
    },

    // Fixed-width histogram binning.
    "q_histogram" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).events
        .select(floor($"value" / 20.0).cast("long").as("bucket"))
        .groupBy($"bucket").agg(count(lit(1)).as("n"))
        .orderBy($"bucket")
    },

    // Extended string-function surface.
    "q_string_fns" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).customer
        .select($"c_custkey",
          lpad($"c_name", 25, "*").as("padded"),
          reverse($"c_name").as("rev"),
          translate($"c_name", "#", "-").as("trans"),
          instr($"c_name", "0").as("pos0"),
          substring($"c_name", -3, 3).as("last3"),
          ltrim(rtrim(concat(lit("  "), $"c_name", lit("  ")))).as("trimmed"),
          repeat(substring($"c_name", 1, 2), 2).as("rep2"))
        .orderBy($"c_custkey")
    },

    // Array-function surface: per-order quantity arrays (deterministic
    // order via linenumber sort) reduced to scalars — element access,
    // min/max, distinct, membership, and a sequential 3-element fold.
    // Arrays never reach the output (cross-engine stringification
    // differs); only scalar reductions do.
    "q_array_fns" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).lineitem
        .groupBy($"l_orderkey")
        .agg(transform(
          array_sort(collect_list(struct($"l_linenumber".as("ln"), $"l_quantity".as("q")))),
          x => x.getField("q")).as("qs"))
        .select($"l_orderkey",
          size($"qs").cast("long").as("n"),
          element_at($"qs", 1).as("first_q"),
          element_at($"qs", -1).as("last_q"),
          array_max($"qs").as("max_q"),
          array_min($"qs").as("min_q"),
          size(array_distinct($"qs")).cast("long").as("n_distinct"),
          array_contains($"qs", 50.0).cast("int").as("has50"),
          aggregate(slice($"qs", 1, 3), lit(0.0), (a, b) => a + b).as("head3_sum"))
        .orderBy($"l_orderkey")
    },

    // Math-function surface (IEEE-exact operations only — sqrt, abs,
    // ceil/floor, sign, fmod are bit-identical across engines; exp/ln
    // style libm functions are not and are used only under rounding, as
    // in tx_tfidf).
    "q_math_fns" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).events
        .select($"event_id",
          sqrt($"value").as("root"),
          abs($"value" - 100.0).as("dist"),
          ceil($"value" / 7.0).as("c7"),
          floor($"value" / 7.0).as("f7"),
          signum($"value" - 100.0).cast("long").as("sgn"),
          ($"value" % 7.0).as("m7"),
          ($"value" * $"value").as("sq"))
        .orderBy($"event_id")
    },

    // Extended date/time-function surface.
    "q_date_fns" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).orders
        .select($"o_orderkey",
          date_trunc("month", $"o_orderdate").cast("date").cast("string").as("month_start"),
          last_day($"o_orderdate").cast("string").as("month_end"),
          add_months($"o_orderdate", 1).cast("date").cast("string").as("plus_month"),
          datediff($"o_orderdate", lit("1995-01-01").cast("date")).as("days_since"),
          dayofyear($"o_orderdate").as("doy"),
          quarter($"o_orderdate").as("qtr"),
          date_format($"o_orderdate", "yyyy-MM").as("ym"))
        .orderBy($"o_orderkey")
    },

    // Grouped top-k via the custom bounded-heap aggregate (no window
    // sort: each map task ships at most k entries per group; shuffle is
    // O(groups × k) — see functions/GroupedTopK).
    "q_grouped_topk" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).events
        .groupBy($"user_id")
        .agg(graft.functions.GroupedTopK
          .groupedTopK($"value", $"event_id", 3).as("top"))
        .select($"user_id", posexplode($"top").as(Seq("r", "t")))
        .select($"user_id", ($"r" + 1).as("rank"), $"t.id".as("event_id"),
          $"t.ord".as("value"))
        .orderBy($"user_id", $"rank")
    },

    // Exact interpolated percentiles per group.
    "q_percentiles" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).events
        .groupBy($"event_type")
        .agg(
          percentile($"value", lit(0.25)).as("p25"),
          percentile($"value", lit(0.5)).as("p50"),
          percentile($"value", lit(0.75)).as("p75"))
        .orderBy($"event_type")
    },

    // Null-handling scalar surface: NULLIF / COALESCE / null-safe
    // comparison / null-aware aggregation.
    "q_null_fns" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).orders
        .select($"o_orderkey",
          nullif($"o_orderstatus", lit("P")).as("status_or_null"),
          coalesce(nullif($"o_orderstatus", lit("P")), lit("PENDING")).as("status_filled"),
          ($"o_orderstatus" <=> "P").as("is_p"))
        .groupBy($"status_or_null", $"status_filled")
        .agg(count(lit(1)).as("n_rows"),
          count($"status_or_null").as("n_nonnull"),
          sum(when($"is_p", 1L).otherwise(0L)).as("n_p"))
        .orderBy($"status_or_null".asc_nulls_first)
    },

    // Rollup (hierarchical grouping sets).
    "q_rollup" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).orders
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), sumDec($"o_totalprice").as("total"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    },

    // Cube (all grouping-set combinations).
    "q_cube" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).orders
        .select($"o_orderstatus", year($"o_orderdate").as("o_year"), dec($"o_totalprice").as("p"))
        .cube($"o_orderstatus", $"o_year")
        .agg(count(lit(1)).as("n"), sum($"p").cast("double").as("total"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_year".asc_nulls_first)
    },

    // Pivot: order counts by status × priority-class columns.
    "q_pivot" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).orders
        .select($"o_orderstatus", substring($"o_orderpriority", 1, 1).as("pc"))
        .groupBy($"o_orderstatus")
        .pivot("pc", Seq("1", "2", "3", "4", "5"))
        .count()
        .na.fill(0L)
        .withColumnsRenamed((1 to 5).map(i => i.toString -> s"p$i").toMap)
        .orderBy($"o_orderstatus")
    },

    // Scalar subquery: orders priced above the global average. The 1-row
    // aggregate is a broadcast nested-loop of a single row — the
    // standard decorrelated plan.
    "q_scalar_subquery" -> { (s, dir) =>
      import s.implicits._
      val o = Tables(s, dir).orders
      val avgPrice = o.agg(
        (sum(dec($"o_totalprice")).cast("double") / count(lit(1))).as("ap"))
      o.select($"o_orderkey", dec($"o_totalprice").cast("double").as("price"))
        .crossJoin(broadcast(avgPrice))
        .filter($"price" > $"ap")
        .select($"o_orderkey", $"price")
        .orderBy($"o_orderkey")
    },

    // Distinct aggregates.
    "q_distinct_agg" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).lineitem
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    },

    // HyperLogLog++ distinct-count sketch vs the exact answer. At 100 TB
    // exact countDistinct shuffles every distinct key to its group's
    // reducer — O(distinct) shuffle rows; the sketch ships one fixed-size
    // (2^p registers) mergeable binary per partition per group instead,
    // the only viable cardinality plan at that scale. Sketches are not
    // portable across engines, so the gate row carries the EXACT count
    // (the anchor both engines agree on) plus an observed-accuracy flag:
    // |hll − exact| ≤ 5%·exact with rsd = 2%. The flag is a real
    // assertion — a Spark-side sketch regression (or an rsd
    // misconfiguration) flips it to false and fails the hash compare.
    "q_approx_distinct" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).events
        .groupBy($"event_type")
        .agg(
          countDistinct($"user_id").as("exact_users"),
          approx_count_distinct($"user_id", rsd = 0.02).as("hll"),
          count(lit(1)).as("n_events"))
        .select($"event_type", $"exact_users", $"n_events",
          (abs($"hll" - $"exact_users") <=
            $"exact_users".cast("double") * 0.05).as("hll_within_5pct"))
        .orderBy($"event_type")
    },

    // Time-bucketed aggregation (batch analog of the streaming window op).
    "q_events_hourly" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).events
        .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(count(lit(1)).as("n"), sumDec($"value").as("total_value"))
        .orderBy($"hour", $"event_type")
    },

    // JSON extraction from the events.props column.
    "q_json_extract" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).events
        .select($"event_id", get_json_object($"props", "$.k").cast("long").as("k"))
        .groupBy($"k").agg(count(lit(1)).as("n"))
        .orderBy($"k")
    },

    // Interval join (Flink-style): for each error event, the click events
    // by the same user in the preceding 6 hours. The naive plan for the
    // inequality predicate is a per-key cross product (BroadcastNestedLoop
    // at best); instead the window is turned into an EQUI-join by bucketing
    // time into bins exactly one window wide — a click in [err−6h, err)
    // lies in the error's bin or the one before it, so exploding the error
    // side into those two bins and joining on (user, bin) gives a shuffle
    // hash/merge join with ≤2× probe duplication, then the exact predicate
    // refines. At 100 TB this is the only interval-join plan that scales:
    // cost follows true pair density, never |errors|×|clicks| per user.
    "q_interval_join" -> { (s, dir) =>
      import s.implicits._
      val binUs = 6L * 3600L * 1000000L // bin width == window length (6 h)
      val ev    = Tables(s, dir).events
      val err = ev.filter($"event_type" === "error")
        .select($"event_id".as("err_id"), $"user_id",
          unix_micros($"ts").as("err_us"))
        .withColumn("bin", explode(array(
          expr(s"err_us div $binUs") - 1, expr(s"err_us div $binUs"))))
      val clk = ev.filter($"event_type" === "click")
        .select($"user_id".as("c_user"), unix_micros($"ts").as("click_us"))
        .withColumn("bin", expr(s"click_us div $binUs"))
      err.join(clk, err("user_id") === clk("c_user") && err("bin") === clk("bin"))
        .filter($"click_us" >= $"err_us" - binUs && $"click_us" < $"err_us")
        .groupBy($"err_id")
        .agg(count(lit(1)).as("n_clicks"),
          min($"click_us").as("first_click_us"),
          max($"click_us").as("last_click_us"))
        .orderBy($"err_id")
    },

    // Quantile sketch vs its exact anchor — same contract as
    // q_approx_distinct: at 100 TB an exact grouped percentile sorts every
    // group's values (O(n log n) per group, full shuffle of the value
    // column); percentile_approx ships one bounded GK sketch per partition
    // per group. Sketches aren't portable across engines, so the gate row
    // carries the exact interpolated percentiles (both engines agree) plus
    // observed-accuracy flags stated in the sketch's OWN contract — rank
    // error, not value distance (a sparse tail makes the nearest element
    // arbitrarily far in value while still rank-exact): the fraction of
    // values ≤ the sketch's answer must sit within ε + tie/discreteness
    // slack of p. A Spark-side sketch regression flips a flag and fails
    // the hash compare.
    "q_approx_quantile" -> { (s, dir) =>
      import s.implicits._
      val apx = Tables(s, dir).events
        .groupBy($"event_type")
        .agg(
          percentile($"value", lit(0.5)).as("exact_p50"),
          percentile($"value", lit(0.95)).as("exact_p95"),
          percentile_approx($"value", lit(0.5), lit(10000)).as("apx50"),
          percentile_approx($"value", lit(0.95), lit(10000)).as("apx95"))
      def rankOk(apxCol: Column, p: Double): Column = {
        // percentile/percentile_approx ignore NULL values, so the
        // observed-rank fraction must be taken over non-null values only
        // (count($"value"), not count(*)) or a NULL-bearing column
        // deflates the fraction and flips the flag against a fine sketch
        val nv = count($"value")
        val frac = sum(when($"value" <= apxCol, 1L).otherwise(0L))
          .cast("double") / nv
        abs(frac - p) <= lit(0.02) + lit(2.0) / nv
      }
      Tables(s, dir).events
        .join(broadcast(apx), "event_type")
        .groupBy($"event_type")
        .agg(
          first($"exact_p50").as("exact_p50"),
          first($"exact_p95").as("exact_p95"),
          count(lit(1)).as("n"),
          rankOk($"apx50", 0.5).as("p50_rank_ok"),
          rankOk($"apx95", 0.95).as("p95_rank_ok"))
        .orderBy($"event_type")
    },

    // Hopping (sliding) windows: 2 h windows every 30 min — each event
    // lands in 4 overlapping windows. q_events_hourly covers tumbling;
    // this is the overlapping shape Structured Streaming's window(slide)
    // uses. Spark expands each row into its windows (Expand, factor =
    // size/slide) before one partial+final aggregation — the output is
    // bounded by slots × types regardless of corpus size, and the
    // expansion happens map-side so the shuffle carries only partials.
    "q_hopping" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).events
        .groupBy(window($"ts", "2 hours", "30 minutes").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), sumDec($"value").as("total_value"))
        .select($"w.start".as("w_start"), $"event_type", $"n", $"total_value")
        .orderBy($"w_start", $"event_type")
    },

    // Time-series densification (gap fill): every hour in the corpus's
    // span appears, absent hours with n = 0 — the monitoring/feature
    // pipeline shape. ONE corpus scan: the gaps are generated from the
    // hourly rollup itself — each present hour emits the missing hours
    // up to its successor (lead + sequence), so there is no second
    // bounds pass over events (a spine-join formulation measurably
    // re-scanned the corpus: the pruned spine subtree defeats
    // ReuseExchange). The successor lookup runs over the ROLLUP, whose
    // size is bounded by the time span (hours, not rows) — so it folds
    // into ONE array row and reads the next element with a HOF instead
    // of an unpartitioned `lead().over(orderBy)` window: same values,
    // zero single-partition window operators in the plan.
    "q_gapfill" -> { (s, dir) =>
      import s.implicits._
      val hourly = Tables(s, dir).events
        .groupBy(date_trunc("hour", $"ts").as("hour"))
        .agg(count(lit(1)).as("n"))
      hourly
        .agg(sort_array(collect_list(struct($"hour", $"n"))).as("hs"))
        .select(explode(expr(
          "transform(hs, (x, i) -> struct(x.hour as h0, x.n as n, " +
            "if(i + 1 < size(hs), hs[i + 1].hour, null) as nxt))")).as("o"))
        .select($"o.h0".as("h0"), $"o.n".as("n"), explode(sequence(
          $"o.h0",
          coalesce($"o.nxt" - expr("INTERVAL 1 HOUR"), $"o.h0"),
          expr("INTERVAL 1 HOUR"))).as("hour"))
        .select($"hour",
          when($"hour" === $"h0", $"n").otherwise(0L).as("n"))
        .orderBy($"hour")
    },

    // Ordered funnel: signup → first click at-or-after it → first
    // purchase at-or-after that, per user. Stage timestamps come from
    // conditional min-aggregates joined back on user_id (equi joins that
    // shuffle-partition by user at scale — never a window over the full
    // event stream); the three stage counts collapse to one row.
    "q_funnel" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events.select($"user_id", $"event_type", $"ts")
      val st = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"ts").as("st"))
      val ct = ev.filter($"event_type" === "click").join(st, "user_id")
        .filter($"ts" >= $"st")
        .groupBy($"user_id").agg(min($"ts").as("ct"))
      val pt = ev.filter($"event_type" === "purchase").join(ct, "user_id")
        .filter($"ts" >= $"ct")
        .groupBy($"user_id").agg(min($"ts").as("pt"))
      st.agg(count(lit(1)).as("n_signup"))
        .crossJoin(broadcast(ct.agg(count(lit(1)).as("n_click"))))
        .crossJoin(broadcast(pt.agg(count(lit(1)).as("n_purchase"))))
    },

    // Cohort retention: users grouped by first-seen week, counted in
    // each later week they are active — the classic warehouse retention
    // matrix. Both frames aggregate before the equi join on user_id, so
    // the join moves one row per (user, active week), not raw events.
    "q_cohort" -> { (s, dir) =>
      import s.implicits._
      val wk = date_trunc("week", $"ts").cast("date")
      val ev = Tables(s, dir).events
      val first = ev.groupBy($"user_id").agg(min(wk).as("cohort_week"))
      val active = ev.select($"user_id", wk.as("week")).distinct()
      active.join(first, "user_id")
        .groupBy($"cohort_week",
          expr("datediff(week, cohort_week) div 7").as("week_offset"))
        .agg(countDistinct($"user_id").as("n_users"))
        .select($"cohort_week".cast("string").as("cohort_week"),
          $"week_offset", $"n_users")
        .orderBy($"cohort_week", $"week_offset")
    },

    // Pearson correlation from exact-DECIMAL moments: Spark's corr()
    // (and any streaming double formulation) is partition-order
    // dependent; the five moments are DECIMAL sums (exact, associative)
    // and r assembles from them in one fixed double expression — the
    // same bits under any partitioning, and the same plan shape as any
    // other partial+final aggregate.
    "q_corr" -> { (s, dir) =>
      import s.implicits._
      val x  = dec($"l_quantity")
      val y  = dec($"l_discount")
      Tables(s, dir).lineitem
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
        .select($"l_returnflag",
          (($"n" * $"sxy".cast("double") - $"sx".cast("double") * $"sy".cast("double"))
            / (sqrt($"n" * $"sxx".cast("double") - $"sx".cast("double") * $"sx".cast("double"))
              * sqrt($"n" * $"syy".cast("double") - $"sy".cast("double") * $"sy".cast("double"))))
            .as("r_qty_disc"),
          $"n")
        .orderBy($"l_returnflag")
    },

    // Unpivot (wide → long), the inverse of q_pivot: per-returnflag sums
    // melted into (metric, value) rows. Narrow projection over the
    // 3-row aggregate — the relational melt the reference expresses as a
    // per-record emit loop in its map phase.
    "q_unpivot" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).lineitem
        .groupBy($"l_returnflag")
        .agg(sumDec($"l_quantity").as("quantity"),
          sumDec($"l_extendedprice").as("price"),
          sumDec($"l_discount").as("discount"))
        .unpivot(Array($"l_returnflag"),
          Array($"quantity", $"price", $"discount"), "metric", "value")
        .orderBy($"l_returnflag", $"metric")
    }
  )

  def oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "q3_join_topk" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_semi_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 180)
        |  AND c_custkey NOT IN (SELECT user_id FROM events WHERE event_type = 'error' AND value > 180)
        |ORDER BY c_custkey""".stripMargin,

    "q_window" ->
      """SELECT user_id, rn, event_id, running_value FROM (
        |  SELECT user_id, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |  FROM events)
        |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,

    "q_window_fns" ->
      """SELECT user_id, rn, event_id, drank, quartile, prank, cdist, prev_id, next_id
        |FROM (
        |  SELECT user_id, event_id,
        |    row_number() OVER w AS rn,
        |    dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS drank,
        |    ntile(4) OVER w AS quartile,
        |    round(percent_rank() OVER w, 6) AS prank,
        |    round(cume_dist() OVER w, 6) AS cdist,
        |    lag(event_id, 1, -1) OVER w AS prev_id,
        |    lead(event_id, 1, -1) OVER w AS next_id
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |WHERE rn <= 5 ORDER BY user_id, rn""".stripMargin,

    "q_asof_join" ->
      """SELECT event_id, user_id, COALESCE(signup_id, -1) AS signup_id FROM (
        |  SELECT event_id, user_id, event_type,
        |    last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS signup_id
        |  FROM events WHERE event_type IN ('purchase', 'signup'))
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q_asof_native" ->
      """SELECT p.event_id AS event_id, p.user_id AS user_id,
        |  COALESCE((SELECT c.event_id FROM events c
        |            WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |              AND c.ts <= p.ts
        |            ORDER BY c.ts DESC, c.event_id DESC LIMIT 1), -1) AS click_id
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    // forward ties resolve to the SMALLEST tiebreak (first recorded
    // wins — the mirror of backward's last-wins), hence ASC in the
    // correlated ORDER BY.
    "q_asof_forward" ->
      """SELECT p.event_id AS event_id, p.user_id AS user_id,
        |  COALESCE((SELECT c.event_id FROM events c
        |            WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |              AND c.ts >= p.ts
        |            ORDER BY c.ts ASC, c.event_id ASC LIMIT 1), -1) AS click_id
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    "q_asof_strict" ->
      """SELECT p.event_id AS event_id, p.user_id AS user_id,
        |  COALESCE((SELECT c.event_id FROM events c
        |            WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |              AND c.ts < p.ts
        |            ORDER BY c.ts DESC, c.event_id DESC LIMIT 1), -1) AS click_id
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    // selection first (latest at-or-before, ignoring tolerance), gate
    // second — pandas semantics; the two correlated subqueries share one
    // deterministic ordering so (ts, id) come from the same row
    "q_asof_tolerance" ->
      """SELECT p.event_id AS event_id, p.user_id AS user_id,
        |  COALESCE(CASE WHEN
        |    epoch_us(p.ts) - (SELECT epoch_us(c.ts) FROM events c
        |       WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |         AND c.ts <= p.ts
        |       ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) <= 3600000000
        |    THEN (SELECT c.event_id FROM events c
        |       WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |         AND c.ts <= p.ts
        |       ORDER BY c.ts DESC, c.event_id DESC LIMIT 1)
        |    END, -1) AS click_id
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    // nearest-in-time: order candidates by absolute distance, then side
    // (at-or-before beats after on equal distance), then the side's own
    // tie rule (backward last-wins = event_id DESC via negation, forward
    // first-wins = event_id ASC).
    "q_asof_nearest" ->
      """SELECT p.event_id AS event_id, p.user_id AS user_id,
        |  COALESCE((SELECT c.event_id FROM events c
        |            WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |              AND c.ts IS NOT NULL AND p.ts IS NOT NULL
        |            ORDER BY abs(epoch_ns(c.ts) - epoch_ns(p.ts)) ASC,
        |              CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END ASC,
        |              CASE WHEN c.ts <= p.ts THEN -c.event_id ELSE c.event_id END ASC
        |            LIMIT 1), -1) AS click_id
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    "q_setops" ->
      """WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 150),
        |     clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click' AND value > 150),
        |     signups AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup' AND value > 150)
        |SELECT DISTINCT user_id FROM (
        |  (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM clickers)
        |  EXCEPT SELECT user_id FROM signups
        |  UNION
        |  ((SELECT user_id FROM buyers EXCEPT SELECT user_id FROM clickers)
        |   EXCEPT SELECT user_id FROM signups))
        |ORDER BY user_id""".stripMargin,

    "q_setops_all" ->
      """WITH a AS (SELECT user_id FROM events WHERE event_type = 'click'),
        |b AS (SELECT user_id FROM events WHERE event_type = 'view'),
        |i AS (SELECT user_id, count(*) AS n_inter
        |      FROM (SELECT user_id FROM a INTERSECT ALL SELECT user_id FROM b)
        |      GROUP BY 1),
        |e AS (SELECT user_id, count(*) AS n_except
        |      FROM (SELECT user_id FROM a EXCEPT ALL SELECT user_id FROM b)
        |      GROUP BY 1)
        |SELECT COALESCE(i.user_id, e.user_id) AS user_id,
        |  COALESCE(n_inter, 0) AS n_inter, COALESCE(n_except, 0) AS n_except
        |FROM i FULL OUTER JOIN e ON i.user_id = e.user_id
        |ORDER BY user_id""".stripMargin,

    "q_regexp" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        |  len(regexp_extract_all(c_name, '[0-9]')) AS n_digits
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_scalar_fns" ->
      """SELECT o_orderkey,
        |  UPPER(SUBSTRING(o_orderpriority, 1, 1)) AS prio_code,
        |  YEAR(o_orderdate) AS o_year,
        |  MONTH(o_orderdate) AS o_month,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.10 AS DECIMAL(3,2)) AS DOUBLE) AS taxed,
        |  CASE WHEN o_orderstatus = 'F' THEN 'done'
        |       WHEN o_orderstatus = 'O' THEN 'open'
        |       ELSE 'partial' END AS status_word,
        |  LENGTH(o_orderpriority) AS prio_len,
        |  CONCAT_WS('-', o_orderstatus, o_orderpriority) AS tag
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_correlated_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_totalprice > 300000 AND year(o.o_orderdate) = 1997)
        |ORDER BY c_custkey""".stripMargin,

    "q_sliding_sum" ->
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |         CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events),
        |w AS (
        |  SELECT user_id,
        |    CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY sec
        |      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum
        |  FROM e)
        |SELECT user_id, max(hour_sum) AS peak_hour_sum, count(*) AS n_events
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL
        |              OR CAST(floor(epoch(ts)) AS BIGINT)
        |                 - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS new_session, ts, event_id
        |  FROM g),
        |sx AS (
        |  SELECT user_id,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM f),
        |per AS (
        |  SELECT user_id, session_idx, count(*) AS n_events
        |  FROM sx GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events
        |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_outer_join" ->
      """WITH buys AS (
        |  SELECT user_id AS u1, count(*) AS n_buy FROM events
        |  WHERE event_type = 'purchase' AND value > 170 GROUP BY 1),
        |errs AS (
        |  SELECT user_id AS u2, count(*) AS n_err FROM events
        |  WHERE event_type = 'error' AND value > 170 GROUP BY 1)
        |SELECT COALESCE(u1, u2) AS user_id,
        |  COALESCE(n_buy, 0) AS n_buy, COALESCE(n_err, 0) AS n_err
        |FROM buys FULL OUTER JOIN errs ON u1 = u2
        |ORDER BY user_id""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(value / 20.0) AS BIGINT) AS bucket, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_string_fns" ->
      """SELECT c_custkey,
        |  lpad(c_name, 25, '*') AS padded,
        |  reverse(c_name) AS rev,
        |  translate(c_name, '#', '-') AS trans,
        |  instr(c_name, '0') AS pos0,
        |  substring(c_name, length(c_name) - 2, 3) AS last3,
        |  ltrim(rtrim('  ' || c_name || '  ')) AS trimmed,
        |  repeat(substring(c_name, 1, 2), 2) AS rep2
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_array_fns" ->
      """WITH a AS (
        |  -- tie-break by quantity: the synthetic lineitem repeats
        |  -- l_linenumber within an order (matches the Spark side's
        |  -- (ln, q) struct sort)
        |  SELECT l_orderkey, list(l_quantity ORDER BY l_linenumber, l_quantity) AS qs
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  len(qs) AS n,
        |  qs[1] AS first_q,
        |  qs[-1] AS last_q,
        |  list_max(qs) AS max_q,
        |  list_min(qs) AS min_q,
        |  CAST(len(list_distinct(qs)) AS BIGINT) AS n_distinct,
        |  CAST(list_contains(qs, 50.0) AS INTEGER) AS has50,
        |  list_reduce(list_prepend(0.0::DOUBLE, qs[1:3]), (a, b) -> a + b) AS head3_sum
        |FROM a ORDER BY l_orderkey""".stripMargin,

    "q_math_fns" ->
      """SELECT event_id,
        |  sqrt(value) AS root,
        |  abs(value - 100.0) AS dist,
        |  CAST(ceil(value / 7.0) AS BIGINT) AS c7,
        |  CAST(floor(value / 7.0) AS BIGINT) AS f7,
        |  CAST(sign(value - 100.0) AS BIGINT) AS sgn,
        |  fmod(value, 7.0) AS m7,
        |  value * value AS sq
        |FROM events ORDER BY event_id""".stripMargin,

    "q_date_fns" ->
      """SELECT o_orderkey,
        |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
        |  CAST(CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS VARCHAR) AS plus_month,
        |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |  dayofyear(o_orderdate) AS doy,
        |  quarter(o_orderdate) AS qtr,
        |  strftime(o_orderdate, '%Y-%m') AS ym
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_grouped_topk" ->
      """SELECT user_id, rank, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS rank
        |  FROM events)
        |WHERE rank <= 3 ORDER BY user_id, rank""".stripMargin,

    "q_percentiles" ->
      """SELECT event_type,
        |  quantile_cont(value, 0.25) AS p25,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.75) AS p75
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_null_fns" ->
      """SELECT nullif(o_orderstatus, 'P') AS status_or_null,
        |  coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
        |  count(*) AS n_rows,
        |  count(nullif(o_orderstatus, 'P')) AS n_nonnull,
        |  CAST(sum(CASE WHEN o_orderstatus IS NOT DISTINCT FROM 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY 1, 2 ORDER BY 1 NULLS FIRST""".stripMargin,

    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, YEAR(o_orderdate) AS o_year, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, YEAR(o_orderdate))
        |ORDER BY o_orderstatus NULLS FIRST, o_year NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderstatus,
        |  COUNT(*) FILTER (WHERE substring(o_orderpriority, 1, 1) = '1') AS p1,
        |  COUNT(*) FILTER (WHERE substring(o_orderpriority, 1, 1) = '2') AS p2,
        |  COUNT(*) FILTER (WHERE substring(o_orderpriority, 1, 1) = '3') AS p3,
        |  COUNT(*) FILTER (WHERE substring(o_orderpriority, 1, 1) = '4') AS p4,
        |  COUNT(*) FILTER (WHERE substring(o_orderpriority, 1, 1) = '5') AS p5
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM orders
        |WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) >
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |   FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // The oracle pins the exact anchor and asserts the sketch held its
    // accuracy bound (TRUE literal — Spark's side computes the real flag)
    "q_approx_distinct" ->
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS exact_users,
        |  COUNT(*) AS n_events,
        |  TRUE AS hll_within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_events_hourly" ->
      """SELECT DATE_TRUNC('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_json_extract" ->
      """SELECT CAST(props->>'$.k' AS BIGINT) AS k, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // The oracle states the interval join directly as the inequality
    // predicate — DuckDB's optimizer handles the small gate corpus; the
    // Spark side's bin-join must produce the identical pair set.
    "q_interval_join" ->
      """SELECT e.event_id AS err_id, COUNT(*) AS n_clicks,
        |  MIN(epoch_us(c.ts)) AS first_click_us,
        |  MAX(epoch_us(c.ts)) AS last_click_us
        |FROM events e JOIN events c
        |  ON e.user_id = c.user_id
        | AND c.ts >= e.ts - INTERVAL 6 HOUR AND c.ts < e.ts
        |WHERE e.event_type = 'error' AND c.event_type = 'click'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_approx_quantile" ->
      """SELECT event_type,
        |  quantile_cont(value, 0.5) AS exact_p50,
        |  quantile_cont(value, 0.95) AS exact_p95,
        |  COUNT(*) AS n,
        |  TRUE AS p50_rank_ok,
        |  TRUE AS p95_rank_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // DuckDB has no hopping windows; equivalent expansion: each event's 4
    // containing windows start at floor30(ts) − k·30min, k = 0..3 (the
    // exact-cover identity: k·30 + (ts − floor30(ts)) < 120 always holds).
    "q_hopping" ->
      """SELECT ws AS w_start, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM (SELECT time_bucket(INTERVAL 30 MINUTE, ts)
        |               - k.k * INTERVAL 30 MINUTE AS ws,
        |             event_type, value
        |      FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) AS k(k))
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_funnel" ->
      """WITH s AS (SELECT user_id, min(ts) AS st FROM events
        |           WHERE event_type = 'signup' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS ct FROM events e
        |      JOIN s ON e.user_id = s.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= s.st GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS pt FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.ct GROUP BY 1)
        |SELECT (SELECT COUNT(*) FROM s) AS n_signup,
        |       (SELECT COUNT(*) FROM c) AS n_click,
        |       (SELECT COUNT(*) FROM p) AS n_purchase""".stripMargin,

    // date_diff('week', a, b) on week-truncated bounds ≡ Spark's
    // datediff div 7 (the day difference is an exact multiple of 7).
    "q_cohort" ->
      """WITH f AS (SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
        |           FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events)
        |SELECT CAST(CAST(f.cohort_week AS DATE) AS VARCHAR) AS cohort_week,
        |  CAST(date_diff('week', f.cohort_week, a.week) AS BIGINT) AS week_offset,
        |  COUNT(DISTINCT a.user_id) AS n_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_corr" ->
      """SELECT l_returnflag,
        |  (COUNT(*)*CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))*CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |    - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)*CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE))
        |  / (sqrt(COUNT(*)*CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))*CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)*CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE))
        |   * sqrt(COUNT(*)*CAST(SUM(CAST(l_discount AS DECIMAL(18,2))*CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |      - CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)*CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)))
        |  AS r_qty_disc,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_gapfill" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(hour) AS lo, max(hour) AS hi FROM hourly),
        |spine AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        |  FROM b)
        |SELECT s.hour, CAST(COALESCE(h.n, 0) AS BIGINT) AS n
        |FROM spine s LEFT JOIN hourly h USING (hour)
        |ORDER BY s.hour""".stripMargin,

    "q_unpivot" ->
      """SELECT * FROM (UNPIVOT (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS quantity,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS discount
        |  FROM lineitem GROUP BY l_returnflag
        |) ON quantity, price, discount INTO NAME metric VALUE value)
        |ORDER BY l_returnflag, metric""".stripMargin
  )
}
