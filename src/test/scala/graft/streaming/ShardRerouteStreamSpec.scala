package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.kv.KvOps
import graft.shard.Sharding
import graft.streaming.ShardStream.{RouteUpdate, ShardEvent}

/** Batch/stream parity for the K6 re-route surface: the live
  * [[ShardStream]] state machine, fed the sf0.001 op log with the
  * scripted c1..c4 config churn arriving MID-STREAM (one epoch per
  * micro-batch — the join/leave/move cadence of
  * ref: shardkv/test_test.go:90-141), must aggregate to exactly the
  * `kv_reroute` gate query's rows. Same discipline as
  * [[StreamBatchParitySpec]]: the batch gate query IS the oracle.
  */
class ShardRerouteStreamSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming churn reroute stats equal the kv_reroute gate query") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    implicit val sqlCtx = spark.sqlContext

    // the raw log, shard/epoch-tagged exactly as the batch front end
    // does it (epoch = clientSeq quartile, shard = first key byte)
    val raw = KvOps.opLog(spark, dir).collect()
    val mx = raw.iterator.map(_.clientSeq).max
    def epochOf(clientSeq: Long): Int =
      math.min(3L, clientSeq * 4 / (mx + 1)).toInt
    def shardOf(key: String): Int = key.head.toInt % Sharding.NShards
    val history = Sharding.scriptedHistory.drop(1) // c1..c4 active in epochs 0..3

    val in = MemoryStream[ShardEvent]
    val q = ShardStream.updates(in.toDS())
      .writeStream.format("memory").queryName("reroute_updates")
      .outputMode(OutputMode.Update()).start()

    // one epoch per micro-batch: the config activation records enter the
    // SAME stream as the ops, sequenced ahead of the epoch's ops (the
    // mid-stream churn the batch query can only model statically)
    (0 until 4).foreach { e =>
      val cfg = history(e).shards.zipWithIndex.map { case (gid, shard) =>
        ShardEvent(shard, Long.MinValue + e, "cfg", history(e).num, gid, 0L, 0L)
      }
      val ops = raw.filter(o => epochOf(o.clientSeq) == e).map { o =>
        ShardEvent(shardOf(o.key), o.seq, "op", 0, 0, o.clientId, o.clientSeq)
      }
      in.addData(cfg ++ ops)
      q.processAllAvailable()
    }
    q.stop()

    // roll the emitted per-op rows up to the gate query's contract:
    // ops/reroutes per serving (config, gid), wrong first attempts per
    // rejecting (config, stale gid), anchored on the union of key sets
    val upd = spark.table("reroute_updates").as[RouteUpdate].collect()
    val served = upd.groupBy(u => (u.configNum, u.gid)).map { case (k, us) =>
      k -> (us.length.toLong, us.count(_.rerouted).toLong)
    }
    val wrong = upd.filter(_.rerouted).groupBy(u => (u.configNum, u.staleGid))
      .map { case (k, us) => k -> us.length.toLong }
    val keys = served.keySet ++ wrong.keySet
    val streaming = keys.map { case (cfg, gid) =>
      val (nOps, nRerouted) = served.getOrElse((cfg, gid), (0L, 0L))
      (cfg, gid, nOps, nRerouted, wrong.getOrElse((cfg, gid), 0L))
    }

    val batch = graft.SparkEntry.queries("kv_reroute")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(streaming == batch)
    assert(streaming.nonEmpty)
    // churn must actually have been exercised: the scripted history
    // moves shards, so some op somewhere took the ErrWrongGroup hop
    assert(upd.exists(_.rerouted), "no op was rerouted - churn never bit")
  }

  test("a shard's ops straddling a mid-stream config change reroute only after it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[ShardEvent]
    val q = ShardStream.updates(in.toDS())
      .writeStream.format("memory").queryName("reroute_unit")
      .outputMode(OutputMode.Update()).start()

    // config 1: gid 1 owns shard 0; two ops served in place
    in.addData(
      ShardEvent(0, -100L, "cfg", 1, 1, 0L, 0L),
      ShardEvent(0, 1L, "op", 0, 0, 7L, 1L),
      ShardEvent(0, 2L, "op", 0, 0, 7L, 2L))
    q.processAllAvailable()
    // config 2 arrives mid-stream: shard 0 moves to gid 2 — the next op
    // (and a re-delivered duplicate, which must NOT double-count) takes
    // the stale-clerk hop; a RE-DELIVERED activation of config 2 and a
    // delayed stale config 1 must both be no-ops (at-least-once
    // delivery must not erase prevGid or regress ownership); config 3
    // keeps gid 2 → hop stops
    in.addData(
      ShardEvent(0, -99L, "cfg", 2, 2, 0L, 0L),
      ShardEvent(0, 3L, "op", 0, 0, 7L, 3L),
      ShardEvent(0, 4L, "op", 0, 0, 7L, 3L)) // duplicate (clientId, clientSeq)
    q.processAllAvailable()
    in.addData(
      ShardEvent(0, -99L, "cfg", 2, 2, 0L, 0L), // re-delivered activation
      ShardEvent(0, -100L, "cfg", 1, 1, 0L, 0L)) // delayed stale config
    q.processAllAvailable()
    in.addData(
      ShardEvent(0, -98L, "cfg", 3, 2, 0L, 0L),
      ShardEvent(0, 5L, "op", 0, 0, 7L, 4L))
    q.processAllAvailable()
    q.stop()

    val upd = spark.table("reroute_unit").as[RouteUpdate]
      .collect().sortBy(u => (u.configNum, u.gid))
    assert(upd.toSeq == Seq(
      RouteUpdate(1, 1, 1, rerouted = false),
      RouteUpdate(1, 1, 1, rerouted = false),
      RouteUpdate(2, 2, 1, rerouted = true), // the ErrWrongGroup hop
      RouteUpdate(3, 2, 2, rerouted = false))) // clerk refreshed; no hop
  }

  test("unaffected shards progress through a migration exactly as if it never happened") {
    // TestChallenge2Unaffected analogue (ref: shardkv/test_test.go:
    // 817-885): ops on shards whose owner did NOT change between c_n and
    // c_n+1 must not stall, reroute, or change outcome because some
    // OTHER shard's migration is in flight. Run the same op sequence
    // through two streams — one whose config churn moves shard 0, one
    // whose "churn" moves nothing — and require the unaffected shard 1's
    // emitted rows to be identical, with zero reroutes, in both.
    implicit val sqlCtx = spark.sqlContext

    def run(name: String, movedGidAtC2: Int): Seq[RouteUpdate] = {
      val in = MemoryStream[ShardEvent]
      val q = ShardStream.updates(in.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      // c1: shard 0 → gid 1, shard 1 → gid 2; ops on both shards
      in.addData(
        ShardEvent(0, -100L, "cfg", 1, 1, 0L, 0L),
        ShardEvent(1, -100L, "cfg", 1, 2, 0L, 0L),
        ShardEvent(0, 1L, "op", 0, 0, 7L, 1L),
        ShardEvent(1, 2L, "op", 0, 0, 8L, 1L))
      q.processAllAvailable()
      // c2: shard 0 moves (or doesn't — the control run); shard 1 stays
      // with gid 2 in BOTH runs. Its ops ride through the c2 transition.
      in.addData(
        ShardEvent(0, -99L, "cfg", 2, movedGidAtC2, 0L, 0L),
        ShardEvent(1, -99L, "cfg", 2, 2, 0L, 0L),
        ShardEvent(1, 3L, "op", 0, 0, 8L, 2L),
        ShardEvent(0, 4L, "op", 0, 0, 7L, 2L),
        ShardEvent(1, 5L, "op", 0, 0, 8L, 3L))
      q.processAllAvailable()
      // c3: no further movement; one more op per shard
      in.addData(
        ShardEvent(0, -98L, "cfg", 3, movedGidAtC2, 0L, 0L),
        ShardEvent(1, -98L, "cfg", 3, 2, 0L, 0L),
        ShardEvent(1, 6L, "op", 0, 0, 8L, 4L),
        ShardEvent(0, 7L, "op", 0, 0, 7L, 3L))
      q.processAllAvailable()
      q.stop()
      spark.table(name).as[RouteUpdate].collect().toSeq
    }

    val withMigration = run("unaffected_mig", movedGidAtC2 = 3)
    val control = run("unaffected_ctl", movedGidAtC2 = 1)

    // shard 1 is owned by gid 2 throughout both runs — its rows are the
    // gid 2 rows. They must never reroute and must be IDENTICAL whether
    // or not shard 0's migration happened.
    val unaffectedMig = withMigration.filter(_.gid == 2)
    val unaffectedCtl = control.filter(_.gid == 2)
    assert(unaffectedMig.forall(!_.rerouted),
      s"ops on the unchanged shard took the ErrWrongGroup hop: $unaffectedMig")
    assert(unaffectedMig == unaffectedCtl,
      s"migration changed the unaffected shard's service: $unaffectedMig vs $unaffectedCtl")
    assert(unaffectedMig.map(_.configNum).distinct.sorted == Seq(1, 2, 3),
      "the unaffected shard must make progress in EVERY config epoch")
    // sanity: the migration run did move shard 0 (one reroute there)
    assert(withMigration.exists(u => u.gid == 3 && u.rerouted),
      "the migration run never exercised a shard move")
    assert(!control.exists(_.rerouted), "the control run must be churn-free")
  }

  test("ops before the first config activation buffer, then land under it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[ShardEvent]
    val q = ShardStream.updates(in.toDS())
      .writeStream.format("memory").queryName("reroute_preconfig")
      .outputMode(OutputMode.Update()).start()

    // ops arrive before ANY config: un-routable (shardmaster config 0
    // has no groups) — nothing may be emitted, and in particular no
    // fabricated configNum=-1 row the batch rollup could never match
    in.addData(
      ShardEvent(0, 1L, "op", 0, 0, 9L, 1L),
      ShardEvent(0, 2L, "op", 0, 0, 9L, 2L),
      ShardEvent(0, 3L, "op", 0, 0, 9L, 2L)) // duplicate, must dedup too
    q.processAllAvailable()
    assert(spark.table("reroute_preconfig").count() === 0L,
      "pre-config ops leaked into the output")
    // first activation: the held retries land under config 1, deduped,
    // in arrival order, with the first-config stale view (no hop)
    in.addData(
      ShardEvent(0, -100L, "cfg", 1, 1, 0L, 0L),
      ShardEvent(0, 4L, "op", 0, 0, 9L, 3L))
    q.processAllAvailable()
    q.stop()

    val upd = spark.table("reroute_preconfig").as[RouteUpdate].collect().toSeq
    assert(upd == Seq(
      RouteUpdate(1, 1, 1, rerouted = false), // buffered seq 1
      RouteUpdate(1, 1, 1, rerouted = false), // buffered seq 2 (dup dropped)
      RouteUpdate(1, 1, 1, rerouted = false))) // live seq 4
  }
}
