package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.shard.Sharding

/** Per-shard PARTIAL migration progress — the TestChallenge2Partial
  * analogue (ref: shardkv/test_test.go:887): a reconfiguration's handoff
  * must be applicable one SHARD at a time, with ops on an arrived shard
  * servable at its new owner immediately, while sibling shards' batches
  * are still pending. The epoch-batch model (kv_gc) applies the whole
  * migration union per transition; here the same union is applied per
  * shard — remove the shard's rows from the loser, insert the handoff
  * batch at the new owner — and at every intermediate step we pin:
  *  (a) EARLY SERVICE: the arrived shard's full key set is resident at
  *      its new owner (set equality with the direct definition — the
  *      new owner can serve that shard before the migration completes);
  *  (b) PENDING ISOLATION: every not-yet-arrived moved shard is still
  *      fully resident at its OLD owner (no partial bleed);
  *  (c) CONVERGENCE: after the last shard's batch, the per-shard fold
  *      equals the per-epoch batch application row-for-row.
  * The companion oracle-gated meter is `kv_partial_migration`.
  */
class KvPartialMigrationSpec extends SparkSpec {

  import spark.implicits._

  private def assertSetEqual(a: DataFrame, b: DataFrame, msg: String): Unit = {
    val extra = a.except(b).count()
    val missing = b.except(a).count()
    assert(extra == 0 && missing == 0, s"$msg (extra=$extra missing=$missing)")
  }

  test("per-shard handoff: arrived shards servable while siblings pend, fold converges") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val hist = Sharding.scriptedHistory.drop(1)
    val fe = KvQueries.firstEpochs(spark, dir) // (key, shard, fe)

    for (e <- 1 until hist.size) {
      val prevCfg = hist(e - 1).shards
      val curCfg = hist(e).shards
      val moved = (0 until Sharding.NShards).filter(sh => prevCfg(sh) != curCfg(sh))
      assert(moved.nonEmpty, s"transition $e moved no shards — scripted history changed?")

      // residents before the transition, owned per the OLD config
      val prevDf = prevCfg.zipWithIndex.map { case (g, sh) => (sh, g) }
        .toDF("shard", "gid")
      val pre = fe.filter($"fe" < e)
        .join(broadcast(prevDf), "shard")
        .select($"key", $"shard", $"gid")
        .localCheckpoint()

      var view = pre
      moved.zipWithIndex.foreach { case (sh, t) =>
        // apply ONLY shard sh's handoff batch: loser drops its copy, the
        // new owner gains it — the migration union restricted to one shard
        val handoff = view.filter($"shard" === sh)
          .select($"key", $"shard", lit(curCfg(sh)).as("gid"))
        view = view.filter($"shard" =!= sh).union(handoff).localCheckpoint()

        // (a) early service: full key set of the arrived shard at new owner
        assertSetEqual(
          view.filter($"shard" === sh && $"gid" === curCfg(sh)).select($"key"),
          fe.filter($"fe" < e && $"shard" === sh).select($"key"),
          s"transition $e: arrived shard $sh not fully servable at new owner")
        assert(view.filter($"shard" === sh && $"gid" =!= curCfg(sh)).count() == 0,
          s"transition $e: loser kept rows of arrived shard $sh")

        // (b) pending moved shards still fully at their old owner
        moved.drop(t + 1).foreach { p =>
          assert(view.filter($"shard" === p && $"gid" =!= prevCfg(p)).count() == 0,
            s"transition $e: pending shard $p bled to a new owner early")
          assertSetEqual(
            view.filter($"shard" === p).select($"key"),
            fe.filter($"fe" < e && $"shard" === p).select($"key"),
            s"transition $e: pending shard $p lost keys mid-migration")
        }
      }

      // (c) the per-shard fold converges to the per-epoch batch application
      val curDf = curCfg.zipWithIndex.map { case (g, sh) => (sh, g) }
        .toDF("shard", "gid")
      val batchApplied = fe.filter($"fe" < e)
        .join(broadcast(curDf), "shard")
        .select($"key", $"shard", $"gid")
      assertSetEqual(view, batchApplied,
        s"transition $e: per-shard fold diverged from per-epoch application")
    }
  }
}
