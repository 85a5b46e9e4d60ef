package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.kv.{KvOp, KvState}

/** Live (streaming) variant of the KV surface: the same declared
  * semantics as [[graft.kv.KvOps]] (models/kv.go:40-54 — Get reads, Put
  * replaces, Append concatenates; exactly-once per (clientId, clientSeq))
  * but served continuously from Structured Streaming keyed state.
  *
  * This is the Spark-native answer to the reference's replicated
  * key/value servers (kvraft/server.go's declared API): the state store
  * checkpoints + write-ahead the per-key state that Raft would have
  * replicated; `flatMapGroupsWithState` is the apply loop.
  *
  * Scale notes: state is partitioned by key across executors (same hash
  * shuffle as the batch path); per-key state carries the live value plus
  * the per-client high-water mark for dedup — O(clients) per key, not
  * O(history).
  */
object KvStream {

  /** Per-key live state: current value + per-client dedup watermark.
    * The reference's clerks retry one op at a time (kvraft/client.go:30-31),
    * so "highest clientSeq applied per client" suffices for exactly-once.
    */
  final case class KvLiveState(value: String, lastSeq: Map[Long, Long])

  /** One update emitted per applied write (op = put | append). */
  final case class KvUpdate(key: String, value: String, appliedSeq: Long)

  private def applyBatch(
      key: String,
      ops: Iterator[KvOp],
      state: GroupState[KvLiveState]): Iterator[KvUpdate] = {
    var st = state.getOption.getOrElse(KvLiveState("", Map.empty))
    val out = Seq.newBuilder[KvUpdate]
    // within a micro-batch, apply in log order
    ops.toSeq.sortBy(_.seq).foreach { o =>
      val last = st.lastSeq.getOrElse(o.clientId, Long.MinValue)
      if (o.clientSeq > last) {
        o.op match {
          case "put" =>
            st = KvLiveState(o.value, st.lastSeq + (o.clientId -> o.clientSeq))
            out += KvUpdate(key, st.value, o.seq)
          case "append" =>
            st = KvLiveState(st.value + o.value, st.lastSeq + (o.clientId -> o.clientSeq))
            out += KvUpdate(key, st.value, o.seq)
          case _ => // gets are served from state reads, not the update stream
            st = KvLiveState(st.value, st.lastSeq + (o.clientId -> o.clientSeq))
        }
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Wire a (possibly streaming) Dataset[KvOp] into the live state
    * machine; emits one row per applied write. OutputMode must be
    * Update/Append-compatible downstream.
    */
  def updates(ops: Dataset[KvOp]): Dataset[KvUpdate] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.key)
      .flatMapGroupsWithState[KvLiveState, KvUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(applyBatch)
  }

  /** Batch-compatible final-state view (for tests / parity with
    * [[graft.kv.KvOps.replay]]): run `updates` and keep each key's last
    * emitted value. Keys that only ever saw gets have no update rows but
    * still exist with state "" in the batch replay, so they are restored
    * via a cogroup with the full key set.
    */
  def finalStates(ops: Dataset[KvOp]): Dataset[KvState] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.key)
      .cogroup(updates(ops).groupByKey(_.key)) { (k, _, us) =>
        val upds = us.toSeq
        if (upds.isEmpty) Iterator.single(KvState(k, "", 0L))
        else Iterator.single(KvState(k, upds.maxBy(_.appliedSeq).value, upds.size.toLong))
      }
  }
}

/** Streaming analytics over the `events` stream shape (ts, user_id,
  * event_type, value): watermarked tumbling-window aggregation with
  * late-data drop — the standard Structured Streaming formulation of the
  * batch `q_events_hourly` query.
  */
object EventWindows {

  private def hourlyWith(
      events: DataFrame, watermarkDelay: String, totalValue: Column): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), totalValue.as("total_value"))
      .select(
        col("window.start").as("hour"),
        col("event_type"), col("n"), col("total_value"))

  /** Hourly tumbling windows per event_type; rows later than the
    * watermark delay are dropped. Sums in plain DOUBLE — cheap, but
    * aggregation-order dependent; use [[hourlyOracleTwin]] when the
    * total must be replay-exact.
    */
  def hourly(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    hourlyWith(events, watermarkDelay, sum(col("value")))

  /** The batch `q_events_hourly` query's EXACT streaming twin: same hour
    * bucket (tumbling-window start ≡ `date_trunc('hour', ts)`) and the
    * same exact-DECIMAL value sum, so a complete-mode replay converges to
    * the oracle query's result bit-for-bit regardless of how the input
    * splits into micro-batches. Watermarked: in append/update mode, late
    * rows drop — and the loss is observable through
    * [[droppedByWatermark]], not silent.
    */
  def hourlyOracleTwin(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    hourlyWith(events, watermarkDelay,
      sum(col("value").cast("decimal(18,2)")).cast("double"))

  /** Late-data loss METER (pattern: Dedup.simhashDropStats — recall loss
    * is measured, never assumed): rows the stateful operators discarded
    * for arriving behind the watermark, summed over the query's retained
    * progress history (the last ~100 micro-batches; read it after
    * `processAllAvailable()`). A production deployment feeds the same
    * counter to a metrics sink via StreamingQueryListener.
    */
  def droppedByWatermark(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.iterator
      .flatMap(_.stateOperators.iterator)
      .map(_.numRowsDroppedByWatermark).sum
}
