package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming depth over the `events` stream shape (ts, user_id,
  * event_type, value) — the continuous-semantics operators a live
  * training-data/telemetry pipeline needs beyond windowed aggregation
  * ([[EventWindows]]) and keyed KV state ([[KvStream]]):
  *
  *  - a watermarked STREAM-STREAM interval join (click→purchase
  *    attribution): both sides buffer in the state store, the time-range
  *    predicate + watermarks bound that state, late rows age out;
  *  - EVENT-TIME TIMEOUT sessionization via `flatMapGroupsWithState`:
  *    per-user session state that emits when the user goes quiet past
  *    the gap — the streaming formulation of the batch `q_sessionize`
  *    query (same 30-minute-gap semantics).
  *
  * Scale notes: both operators shuffle once on user_id and keep
  * per-key state O(1) (session summary) or O(rows-in-interval) (join
  * buffer, bounded by the watermark), exactly the state discipline a
  * 1000-executor deployment needs. No driver-side state anywhere.
  */
object EventStreams {

  /** Click→purchase attribution: for each click, purchases by the same
    * user within `withinSeconds` after the click. The canonical
    * stream-stream inner interval join — Spark buffers each side in the
    * state store and the watermark + range condition let it discard
    * buffered rows once they can no longer match.
    */
  def clickPurchaseJoin(
      clicks: DataFrame, // (click_ts: Timestamp, user_id: Long)
      purchases: DataFrame, // (purchase_ts: Timestamp, user_id: Long)
      withinSeconds: Long = 3600L,
      watermarkDelay: String = "2 hours"): DataFrame = {
    val c = clicks.withWatermark("click_ts", watermarkDelay)
    val p = purchases
      .withColumnRenamed("user_id", "p_user_id")
      .withWatermark("purchase_ts", watermarkDelay)
    c.join(
      p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $withinSeconds SECONDS"))
      .select(col("user_id"), col("click_ts"), col("purchase_ts"))
  }

  /** Streaming twin of the batch `q_interval_join` gate query: for each
    * error, the clicks by the same user in the PRECEDING
    * `lookbackSeconds` — `clickPurchaseJoin` with the range reversed
    * (buffered lookback instead of lookahead). Same boundary convention
    * as the batch bin-join: closed at err−lookback, open at err. The
    * watermark + range condition bound both state-store sides; clicks
    * are discardable once the watermark passes their ts + lookback.
    */
  def errorClickLookback(
      errors: DataFrame, // (err_id: Long, err_ts: Timestamp, user_id: Long)
      clicks: DataFrame, // (click_ts: Timestamp, user_id: Long)
      lookbackSeconds: Long = 21600L,
      watermarkDelay: String = "2 hours"): DataFrame = {
    val e = errors.withWatermark("err_ts", watermarkDelay)
    val c = clicks
      .withColumnRenamed("user_id", "c_user_id")
      .withWatermark("click_ts", watermarkDelay)
    e.join(
      c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") >= col("err_ts") - expr(s"INTERVAL $lookbackSeconds SECONDS") &&
        col("click_ts") < col("err_ts"))
      .select(col("err_id"), col("user_id"), col("err_ts"), col("click_ts"))
  }

  /** Streaming exactly-once-per-event dedup over an at-least-once
    * delivery: `dropDuplicatesWithinWatermark` keeps one state entry per
    * event_id and drops it once the watermark passes the first
    * occurrence's event time + delay — retries arriving within the delay
    * (even with a jittered timestamp, which is why the plain
    * `dropDuplicates` key (id, ts) can't do this) collapse to the first
    * emission. State is bounded by the watermark window, the only
    * tenable posture at 100 TB/day event volume; a global
    * `dropDuplicates("event_id")` would grow its store without bound.
    * Complements the KV family's K4 semantics (first-delivery-wins by
    * (clientId, clientSeq), KvOps/KvStream), which dedups by explicit
    * sequence instead of event identity + time proximity.
    */
  def dedupWithinWatermark(
      events: DataFrame, // needs (ts: Timestamp, event_id: Long)
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** One closed user session (same shape as the batch `q_sessionize`
    * rollup: bounds + event count).
    */
  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long)

  /** Open-session state carried between micro-batches. */
  final case class SessionState(start: Long, last: Long, n: Long)

  /** Streaming sessionization with a 30-minute inactivity gap (matching
    * the batch `q_sessionize`): sessions that close WITHIN a batch
    * (gap exceeded between two arriving events) emit immediately; the
    * trailing open session arms an event-time timeout at `last + gap`
    * and emits when the watermark passes it — the user went quiet.
    *
    * Late rows (ts older than the open session's last event) extend the
    * session conservatively; rows older than the watermark were already
    * dropped upstream by `withWatermark`.
    */
  def sessionize(
      events: DataFrame, // needs (ts: Timestamp, user_id: Long)
      gapMinutes: Long = 30L,
      watermarkDelay: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def close(uid: Long, st: SessionState): Session =
      Session(uid, new Timestamp(st.start), new Timestamp(st.last), st.n)

    events
      .withWatermark("ts", watermarkDelay)
      .select($"user_id".as[Long], $"ts".as[Timestamp])
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: the open session is closed
            val out = state.getOption.map(close(uid, _))
            state.remove()
            out.iterator
          } else {
            val ts = rows.map(_._2.getTime).toSeq.sorted
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption.orNull
            ts.foreach { t =>
              cur match {
                case null =>
                  cur = SessionState(t, t, 1L)
                case c if t - c.last > gapMs =>
                  closed += close(uid, c)
                  cur = SessionState(t, t, 1L)
                case c =>
                  cur = SessionState(c.start, math.max(c.last, t), c.n + 1L)
              }
            }
            state.update(cur)
            // arm the quiet-period alarm; fires once the event-time
            // watermark passes it
            state.setTimeoutTimestamp(cur.last + gapMs)
            closed.result().iterator
          }
      }
  }
}
