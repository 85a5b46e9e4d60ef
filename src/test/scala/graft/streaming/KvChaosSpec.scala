package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.kv.{KvOp, KvOps}

/** Network-chaos analogue of the reference's unreliable labrpc transport
  * (ref: labrpc/labrpc.go:50-120 — dropped, delayed, and re-delivered
  * messages): the live KV state machine must serve the SAME final states
  * as the batch replay when delivery is chaotic. Modeled chaos, per the
  * clerk protocol's guarantees (one op in flight per client,
  * kvraft/client.go:30-31):
  *
  *  - arbitrary micro-batch boundaries (a drop + retry is an op landing
  *    in a later delivery round than its neighbors);
  *  - arrival order scrambled WITHIN each delivery round;
  *  - every op subject to random RE-delivery in any later round (the
  *    at-least-once duplicates dedup exists for), on top of the log's
  *    own built-in every-7th-op duplicates.
  *
  * Cross-round order of FIRST deliveries follows the log, per key —
  * reorderings beyond that change which linearization is served (legal,
  * but a different answer than the batch oracle); that general contract
  * is pinned by LinCheckSpec/LinHistorySpec, while this suite pins
  * bit-exact batch parity under the chaos the clerk protocol can
  * actually produce.
  */
class KvChaosSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("chaotic delivery of the real op log converges to the batch replay, exactly once") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    implicit val sqlCtx = spark.sqlContext
    val log = KvOps.opLog(spark, dir).collect().sortBy(_.seq)
    val rnd = new scala.util.Random(42)

    // carve the seq-ordered log into random delivery rounds
    val rounds = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[KvOp])
    log.foreach { o =>
      if (rounds.last.nonEmpty && rnd.nextInt(40) == 0)
        rounds += scala.collection.mutable.ArrayBuffer.empty[KvOp]
      rounds.last += o
    }

    val in = MemoryStream[KvOp]
    val q = KvStream.updates(in.toDS())
      .writeStream.format("memory").queryName("kv_chaos")
      .outputMode(OutputMode.Update()).start()

    var delivered = Vector.empty[KvOp]
    var extraDups = 0
    rounds.foreach { r =>
      // re-deliver a random sample of anything already sent (a retry
      // always trails its original), scramble the round's arrival order
      val dups = delivered.filter(_ => rnd.nextInt(20) == 0)
      extraDups += dups.size
      in.addData(rnd.shuffle(r.toVector ++ dups))
      q.processAllAvailable()
      delivered ++= r
    }
    q.stop()
    assert(extraDups > 0, "chaos injected no re-deliveries - test proves nothing")

    val updates = spark.table("kv_chaos").as[KvStream.KvUpdate].collect()
    val streaming = updates.groupBy(_.key)
      .map { case (k, us) => k -> (us.maxBy(_.appliedSeq).value, us.length.toLong) }
    val batch = KvOps.replay(spark.createDataset(log.toIndexedSeq)).collect()
      .map(s => s.key -> (s.value, s.n_applied)).toMap

    // every key with applied writes: same final value AND same applied
    // count — the re-deliveries (injected + the log's built-ins) were
    // all rejected, not just most of them
    val batchWritten = batch.filter(_._2._2 > 0)
    assert(streaming.keySet == batchWritten.keySet)
    streaming.foreach { case (k, (v, n)) =>
      assert(batchWritten(k) == ((v, n)), s"key $k diverged")
    }
  }

  test("a late re-delivered append does not reapply over another client's newer put") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KvOp]
    val q = KvStream.updates(in.toDS())
      .writeStream.format("memory").queryName("kv_chaos_unit")
      .outputMode(OutputMode.Update()).start()

    in.addData(KvOp(1L, 1L, 1L, "append", "a", "X"))
    q.processAllAvailable()
    in.addData(KvOp(2L, 2L, 1L, "put", "a", "P"))
    q.processAllAvailable()
    // the retry of client 1's append arrives AFTER client 2's put — it
    // must be recognized and dropped, not appended onto "P"
    in.addData(KvOp(1L, 1L, 1L, "append", "a", "X"))
    q.processAllAvailable()
    q.stop()

    val vals = spark.table("kv_chaos_unit").as[KvStream.KvUpdate]
      .collect().sortBy(_.appliedSeq).map(_.value).toSeq
    assert(vals == Seq("X", "P"))
  }
}
