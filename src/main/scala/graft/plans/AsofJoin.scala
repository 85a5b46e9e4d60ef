package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types._

/** Match direction for the native as-of join: [[AsofDirection.Backward]]
  * attaches the latest right row at-or-before the left time (the default,
  * kdb `aj` / pandas merge_asof semantics); [[AsofDirection.Forward]] the
  * earliest right row at-or-after it (next-touch attribution);
  * [[AsofDirection.Nearest]] whichever of those two is closer in time
  * (equal distance → the backward candidate, the at-or-before
  * convention). All three are the same co-partitioned merge. Forward
  * needs no buffered match at all — the first equal-key right row not
  * yet behind the left time IS the answer. Nearest advances exactly
  * like backward, so after the advance both candidates are in hand for
  * free: the buffered at-or-before row and the merge head (the first
  * equal-key row strictly after the left time) — still O(1) state.
  * Nearest requires a numeric or date/timestamp time column (a distance
  * must be computable, not just an ordering).
  */
sealed trait AsofDirection
object AsofDirection {
  case object Backward extends AsofDirection
  case object Forward extends AsofDirection
  case object Nearest extends AsofDirection
}

/** Native as-of join: for every left row, attach the single right row
  * with equal join keys and the greatest `rightTime <= leftTime`
  * (left-outer semantics — unmatched left rows keep null right columns;
  * equal-time ties resolved by the greatest `rightTiebreak`). With
  * [[AsofDirection.Forward]] the mirror: the smallest
  * `rightTime >= leftTime`, equal-time ties to the SMALLEST tiebreak
  * (first recorded wins — the natural mirror of backward's last-wins).
  *
  * This is the (c)-tier Catalyst extension of the build brief — a whole
  * logical operator Spark's built-ins cannot express without row
  * amplification:
  *
  *  - the range-join formulation (`l.key = r.key AND r.ts <= l.ts` then
  *    max-per-left-row) materializes every PAIR within a key before
  *    aggregating — O(n·m) per key, quadratic on hot keys;
  *  - the union-window trick ([[graft.queries.Analytics]] `q_asof_join`)
  *    avoids amplification but only works when both sides share one
  *    schema, carries both sides' full width through a single sort, and
  *    cannot express cross-table tie semantics (`r.ts <= l.ts` including
  *    same-timestamp rights).
  *
  * The physical operator instead merges the two sides the way
  * sort-merge join does: EnsureRequirements co-partitions both children
  * by the join keys (`ClusteredDistribution`) and sorts each partition
  * by (keys, time) — then one forward pass per partition buffers exactly
  * ONE right row (the current best match) and emits each left row
  * joined to it. No pair blow-up, no per-key buffering, state = one row
  * regardless of skew; at 100 TB the cost is exactly two shuffles (or
  * zero, if both sides are already bucketed by key).
  *
  * Semantics mirror the reference's "latest state at or before T"
  * reads (`/root/reference/src/kvraft/client.go:41-66` — a Get observes
  * the most recent Put at or before it in the serial order), generalized
  * to the standard time-series as-of join.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightTiebreak: Seq[Attribute],
    direction: AsofDirection = AsofDirection.Backward,
    allowExactMatches: Boolean = true)
  extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs at least one equi-key on each side")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match pairwise")
  require(leftTime.dataType == rightTime.dataType,
    "as-of join time columns must share a type")
  // fail at construction, not deep inside RowOrdering at execution: the
  // merge compares keys/times/tiebreaks, so un-orderable types (MapType)
  // are a plan-time error with a readable message
  for (a <- leftKeys ++ rightKeys)
    require(RowOrdering.isOrderable(a.dataType),
      s"as-of join key '${a.name}' has un-orderable type ${a.dataType.simpleString}")
  for (a <- Seq(leftTime, rightTime) ++ rightTiebreak)
    require(RowOrdering.isOrderable(a.dataType),
      s"as-of join time/tiebreak column '${a.name}' has un-orderable type ${a.dataType.simpleString}")
  if (direction == AsofDirection.Nearest)
    require(AsofJoinExec.distanceComputable(leftTime.dataType),
      s"nearest as-of join needs a numeric or date/timestamp time column " +
        s"(got ${leftTime.dataType.simpleString}: ordering alone cannot compare distances)")
  // nearest-strict would need the forward candidate BEYOND an equal-time
  // run whose rows remain backward candidates for later left rows — that
  // needs a buffered run, not O(1) state; fail loudly instead of silently
  // approximating
  require(allowExactMatches || direction != AsofDirection.Nearest,
    "as-of join: allowExactMatches=false is not supported with direction=Nearest")

  /** Left rows pass through 1:1; right columns become nullable (outer). */
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping [[AsofJoinPlan]] onto [[AsofJoinExec]].
  * Injected via [[graft.functions.GraftExtensions]] at session build, or
  * idempotently through `experimental.extraStrategies` by
  * [[AsofJoinOps.asofJoin]] for sessions built without extensions.
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, tb, dir, exact) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb, dir, exact) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: co-partitioned, co-sorted streaming merge.
  *
  * Required properties (EnsureRequirements materializes them as hash
  * exchanges + in-partition sorts, or elides them when the child is
  * already partitioned/sorted — e.g. bucketed tables):
  *  - distribution: both children clustered by their join keys;
  *  - ordering: (keys…, time) ascending; the right side additionally by
  *    the tiebreak columns so "last match recorded wins" is
  *    deterministic on equal timestamps.
  *
  * Per partition, one forward pass: for each left row (in key/time
  * order) the right iterator advances past every row with smaller key,
  * or equal key and `time <= leftTime`; the last equal-key row consumed
  * is the current best match — a single buffered row, O(|L|+|R|) time,
  * O(1) state. NULL keys and NULL times never match (SQL comparison
  * semantics), matching the DuckDB oracle's correlated form.
  */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightTiebreak: Seq[Attribute],
    direction: AsofDirection = AsofDirection.Backward,
    allowExactMatches: Boolean = true)
  extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def keyTimeOrdering(
      keys: Seq[Attribute], time: Attribute, rest: Seq[Attribute]): Seq[SortOrder] =
    (keys :+ time) ++ rest map (a => SortOrder(a, Ascending))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    keyTimeOrdering(leftKeys, leftTime, Nil),
    keyTimeOrdering(rightKeys, rightTime, rightTiebreak))

  // left rows stream through 1:1, so left's partitioning and the
  // required left ordering survive into the output
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    keyTimeOrdering(leftKeys, leftTime, Nil)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched"    -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // separate projections per side: each reuses its own buffer, so a
      // left-key row and a right-key row can be compared without copying
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.length)
      // bind against nullability-ADJUSTED right attrs: unmatched left rows
      // feed an all-null GenericInternalRow for the right side, and a
      // projection built from the original (possibly non-nullable) attrs
      // would codegen without null checks and emit 0/garbage instead of
      // NULL (mirrors how SortMergeJoinExec projects from its nullable
      // `output`, not its children's raw attributes)
      val resultProj = UnsafeProjection.create(
        outAttrs, leftOut ++ rightOut.map(_.withNullability(true)))

      val fwd = direction == AsofDirection.Forward
      val near = direction == AsofDirection.Nearest
      val exact = allowExactMatches
      // distance accessors for NEAREST: integral/datetime types subtract
      // exactly in Long (overflow → loud ArithmeticException rather than
      // a silently wrong sign); float types in Double. Bound once per
      // partition; construction already guaranteed the type is covered.
      val timeLong: InternalRow => Long = timeType match {
        case ByteType => _.getByte(0).toLong
        case ShortType => _.getShort(0).toLong
        case IntegerType | DateType => _.getInt(0).toLong
        case LongType | TimestampType | TimestampNTZType => _.getLong(0)
        case _ => null
      }
      val timeDouble: InternalRow => Double = timeType match {
        case FloatType => _.getFloat(0).toDouble
        case DoubleType => _.getDouble(0)
        case _ => null
      }

      new Iterator[InternalRow] {
        // rHead stays valid until the next rIter.next() call; every row
        // retained PAST a next() (the buffered backward match) is copied
        // first. Forward never buffers: the first equal-key right row not
        // yet behind the left time IS the match, and it stays rHead (a
        // later left row of the same key may match the same right row).
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var bestMatch: InternalRow = null
        private var bestMatchKey: UnsafeRow = null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTimeRow = lTimeProj(lRow)
          val lTimeNull = lTimeRow.isNullAt(0)

          var advancing = rHead != null
          while (advancing) {
            val c = keyOrd.compare(rKeyProj(rHead), lKey)
            if (c < 0) {
              rHead = if (rIter.hasNext) rIter.next() else null
              advancing = rHead != null
            } else if (c == 0 && {
                val rt = rTimeProj(rHead); rt.isNullAt(0)
              }) {
              // NULL right time sorts first within the key group but can
              // never satisfy the time bound in either direction: consume
              // without recording
              rHead = if (rIter.hasNext) rIter.next() else null
              advancing = rHead != null
            } else if (c == 0 && !fwd && !lTimeNull && {
                val rt = rTimeProj(rHead)
                val cmp = timeOrd.compare(rt, lTimeRow)
                if (exact) cmp <= 0 else cmp < 0
              }) {
              if (!lKey.anyNull) { // NULL keys never equi-match
                bestMatch = rHead.copy()
                bestMatchKey = lKey.copy()
              }
              rHead = if (rIter.hasNext) rIter.next() else null
              advancing = rHead != null
            } else if (c == 0 && fwd && !lTimeNull && {
                val rt = rTimeProj(rHead)
                val cmp = timeOrd.compare(rt, lTimeRow)
                // forward: rows behind the bound can never match this or
                // any later left row of this key — discard. Strict mode
                // (allowExactMatches=false) also discards equal-time rows:
                // a later same-key left has a strictly larger time, so an
                // rt == lt row is behind ITS strict bound too.
                if (exact) cmp < 0 else cmp <= 0
              }) {
              rHead = if (rIter.hasNext) rIter.next() else null
              advancing = rHead != null
            } else {
              advancing = false
            }
          }

          val usable = !lTimeNull && !lKey.anyNull
          // backward/nearest candidate: the buffered last at-or-before row.
          // forward/nearest candidate: the advance loop stopped with rHead
          // at the first equal-key row whose time satisfies the forward
          // bound (>= for forward; strictly > for nearest, where an
          // equal-time row was consumed into the buffer at distance 0) —
          // non-null time by construction.
          val bwdOk = !fwd && usable && bestMatch != null &&
            keyOrd.compare(bestMatchKey, lKey) == 0
          val fwdOk = (fwd || near) && usable && rHead != null &&
            keyOrd.compare(rKeyProj(rHead), lKey) == 0
          val rightRow =
            if (fwd) { if (fwdOk) rHead else nullRight }
            else if (!near) { if (bwdOk) bestMatch else nullRight }
            else if (bwdOk && fwdOk) {
              // extract each time scalar immediately: rTimeProj reuses one
              // buffer, so the second projection invalidates the first row
              val pickBwd = if (timeLong != null) {
                val lt = timeLong(lTimeRow)
                val bt = timeLong(rTimeProj(bestMatch))
                val ft = timeLong(rTimeProj(rHead))
                Math.subtractExact(lt, bt) <= Math.subtractExact(ft, lt)
              } else {
                val lt = timeDouble(lTimeRow)
                val bt = timeDouble(rTimeProj(bestMatch))
                val ft = timeDouble(rTimeProj(rHead))
                // NaN float times order after every real time, so a NaN
                // distance must act as +infinity here: the naive
                // `lt - bt <= ft - lt` is false when ft is NaN and would
                // select the NaN-time row over a finite backward match
                val db = lt - bt
                val df = ft - lt
                val dbv = if (java.lang.Double.isNaN(db)) Double.PositiveInfinity else db
                val dfv = if (java.lang.Double.isNaN(df)) Double.PositiveInfinity else df
                dbv <= dfv
              }
              if (pickBwd) bestMatch else rHead
            }
            else if (bwdOk) bestMatch
            else if (fwdOk) rHead
            else nullRight
          if (rightRow ne nullRight) numMatched += 1
          numOutputRows += 1
          resultProj(joined(lRow, rightRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoinExec {
  /** Time types NEAREST can subtract — long-backed integral/datetime
    * types plus the float family. (DecimalType is orderable but excluded
    * until someone needs it; backward/forward accept any orderable type.)
    */
  def distanceComputable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | FloatType | DoubleType => true
    case _ => false
  }
}

/** DataFrame-level entry point for the native as-of join. */
object AsofJoinOps {

  /** `asofJoin(trades, quotes, Seq("sym" -> "sym"), "ts", "q_ts")` — for
    * each left row, the latest right row with equal keys and
    * `rightTime <= leftTime` (ties on time resolved toward the greatest
    * `rightTiebreak`); with `direction = AsofDirection.Forward`, the
    * earliest right row with `rightTime >= leftTime` (ties to the
    * smallest tiebreak); with [[AsofDirection.Nearest]], whichever of
    * the two is closer. `allowExactMatches = false` makes the time bound
    * strict (`<` / `>`, the pandas knob; not combinable with Nearest —
    * see the plan-level require). `tolerance = Some(t)` nulls the right
    * side of any match whose |leftTime − rightTime| exceeds t — the
    * match SELECTION is unchanged (latest-at-or-before first, then the
    * tolerance gate, pandas semantics), applied as a post-projection so
    * no second join runs; requires a numeric time column. Right columns
    * come back nullable; callers rename columns beforehand if the two
    * sides share names. Registers the planner strategy on the session
    * idempotently, so it works on sessions built without
    * [[graft.functions.GraftExtensions]].
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[(String, String)],
      leftTimeCol: String,
      rightTimeCol: String,
      rightTiebreak: Seq[String] = Nil,
      direction: AsofDirection = AsofDirection.Backward,
      allowExactMatches: Boolean = true,
      tolerance: Option[Double] = None): DataFrame = {
    val spark = left.sparkSession
    register(spark)

    // self-join safety: if any exprId appears on both sides, re-alias the
    // right side (Alias always mints fresh exprIds)
    val lPlan = left.queryExecution.analyzed
    val rightSafe =
      if (lPlan.outputSet.intersect(right.queryExecution.analyzed.outputSet).isEmpty) right
      else right.select(right.columns.map(c => right(c).as(c)).toIndexedSeq: _*)
    val rPlan = rightSafe.queryExecution.analyzed

    // resolve through the session's analyzer resolver so case
    // (in)sensitivity follows spark.sql.caseSensitive, and AMBIGUOUS
    // names fail loudly instead of silently binding the first match
    val resolver = spark.sessionState.analyzer.resolver
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.filter(a => resolver(a.name, name)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"$side side has no column '$name' (has: ${plan.output.map(_.name).mkString(", ")})")
        case many => throw new IllegalArgumentException(
          s"$side side column '$name' is ambiguous (${many.size} matches)")
      }

    val ltA = attr(lPlan, leftTimeCol, "left")
    val rtA = attr(rPlan, rightTimeCol, "right")
    val joined = GraftBridge.ofRows(spark, AsofJoinPlan(
      lPlan, rPlan,
      on.map(p => attr(lPlan, p._1, "left")),
      on.map(p => attr(rPlan, p._2, "right")),
      ltA, rtA,
      rightTiebreak.map(attr(rPlan, _, "right")),
      direction, allowExactMatches))
    tolerance match {
      case None => joined
      case Some(tol) =>
        import org.apache.spark.sql.functions.{abs, datediff, lit, unix_micros, when}
        val (ltC, rtC) = (GraftBridge.column(ltA), GraftBridge.column(rtA))
        // the difference is computed in the column's own integral domain
        // (exact — no double cast of large raw values; only the small
        // difference meets the double tolerance). Tolerance unit follows
        // the type: the column's own unit for numerics, MICROSECONDS for
        // timestamps, DAYS for dates.
        val diff = ltA.dataType match {
          case TimestampType => abs(unix_micros(ltC) - unix_micros(rtC))
          case DateType => abs(datediff(ltC, rtC))
          case _: NumericType => abs(ltC - rtC)
          case other => throw new IllegalArgumentException(
            s"as-of tolerance needs a numeric, timestamp, or date time column " +
              s"(got ${other.simpleString})")
        }
        val cond = diff <= lit(tol)
        val keepLeft = lPlan.output.map(GraftBridge.column)
        val gatedRight = rPlan.output.map(a =>
          when(cond, GraftBridge.column(a)).as(a.name))
        joined.select(keepLeft ++ gatedRight: _*)
    }
  }

  /** Idempotently add [[GraftStrategy]] to the session's planner.
    * Checks the materialized planner strategy list too, so sessions
    * built with [[graft.functions.GraftExtensions]] (which injects the
    * strategy via injectPlannerStrategy) don't get a duplicate; the
    * read-modify-write on `extraStrategies` is serialized so concurrent
    * first calls can't append twice.
    */
  def register(spark: SparkSession): Unit = synchronized {
    val present = spark.experimental.extraStrategies.contains(GraftStrategy) ||
      spark.sessionState.planner.strategies.contains(GraftStrategy)
    if (!present)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategy
  }
}
