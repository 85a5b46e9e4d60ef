package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the K6 re-route surface (`kv_reroute`): the
  * join/leave/move churn of the reference's shard tests
  * (ref: shardkv/test_test.go:90-141) with config changes arriving IN
  * the stream, interleaved with client ops.
  *
  * The batch query models the clerk protocol (shardkv/client.go:68-71)
  * over a static log: a clerk's first attempt goes to the owner under
  * its CACHED (one-config-stale) shard map; the current owner's group
  * rejects it with ErrWrongGroup, the clerk refreshes, and the retry
  * lands correctly. Here the same protocol runs live: each shard's
  * group is a [[org.apache.spark.sql.KeyValueGroupedDataset]] state
  * machine that applies config activations and client ops in log order,
  * tracking the active owner, the previous config's owner (what an
  * unrefreshed clerk still holds), and the per-client exactly-once
  * high-water mark (the K4 contract, same as [[KvStream]]).
  *
  * Scale: state is one record per shard — O(shards + clients) — and the
  * stream is hash-partitioned by shard, so churn handling parallelizes
  * across executors exactly like the batch query's shard-keyed joins.
  */
object ShardStream {

  /** One record of a shard's serving stream. `kind = "cfg"`: config
    * `configNum` makes `gid` the shard's owner from `seq` on.
    * `kind = "op"`: a client op (dedup key `(clientId, clientSeq)`).
    */
  final case class ShardEvent(
      shard: Int, seq: Long, kind: String,
      configNum: Int, gid: Int,
      clientId: Long, clientSeq: Long)

  /** Per-shard live state: active config + owner, the previous config's
    * owner, the per-client dedup high-water mark, and ops that arrived
    * before ANY config activation (a clerk cannot route without a shard
    * map — shardmaster config 0 has no groups, so such an op retries
    * with ErrWrongGroup until the first activation lands; we buffer it
    * rather than fabricate a "-1 config" bucket the batch rollup never
    * produces). Bounded by the pre-first-config prefix of the stream.
    */
  final case class PendingOp(clientId: Long, clientSeq: Long)
  final case class ShardState(
      configNum: Int, gid: Int, prevGid: Int, lastSeq: Map[Long, Long],
      pending: Seq[PendingOp])

  /** One row per APPLIED (deduped) op: the config it was served under,
    * the serving owner, and the stale first-attempt target — `rerouted`
    * is the ErrWrongGroup retry hop.
    */
  final case class RouteUpdate(
      configNum: Int, gid: Int, staleGid: Int, rerouted: Boolean)

  private def applyShard(
      shard: Int,
      events: Iterator[ShardEvent],
      state: GroupState[ShardState]): Iterator[RouteUpdate] = {
    var st = state.getOption.getOrElse(ShardState(-1, -1, -1, Map.empty, Nil))
    val out = Seq.newBuilder[RouteUpdate]
    // apply one (deduped) op under the CURRENT config
    def serve(clientId: Long, clientSeq: Long): Unit = {
      val last = st.lastSeq.getOrElse(clientId, Long.MinValue)
      if (clientSeq > last) {
        st = st.copy(lastSeq = st.lastSeq + (clientId -> clientSeq))
        out += RouteUpdate(st.configNum, st.gid, st.prevGid, st.prevGid != st.gid)
      }
    }
    events.toSeq.sortBy(_.seq).foreach { e =>
      if (e.kind == "cfg") {
        // config numbers only advance (shardmaster hands out a strictly
        // increasing sequence) — a re-delivered or delayed activation of
        // an already-active or OLDER config must be a no-op, or it would
        // overwrite prevGid (erasing the reroute hop from the stats) or
        // regress ownership entirely; the stream is at-least-once like
        // everything else in this family
        if (e.configNum > st.configNum) {
          // first config ever seen: clerks start with it, so the "stale"
          // view equals the active one (the batch model's max(0, e-1))
          val first = st.configNum < 0
          val prev = if (first) e.gid else st.gid
          st = ShardState(e.configNum, e.gid, prev, st.lastSeq, st.pending)
          if (first) {
            // the buffered pre-config ops' retries now land, in their
            // original arrival order, under this first config
            val held = st.pending
            st = st.copy(pending = Nil)
            held.foreach(p => serve(p.clientId, p.clientSeq))
          }
        }
      } else if (st.configNum < 0) {
        // no config yet: un-routable — hold the op instead of emitting
        // a sentinel-config row the batch parity rollup cannot match
        st = st.copy(pending = st.pending :+ PendingOp(e.clientId, e.clientSeq))
      } else {
        serve(e.clientId, e.clientSeq)
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Wire a (possibly streaming) shard-event Dataset into the live
    * reroute state machine; emits one row per applied op.
    */
  def updates(events: Dataset[ShardEvent]): Dataset[RouteUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.shard)
      .flatMapGroupsWithState[ShardState, RouteUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(applyShard)
  }
}
