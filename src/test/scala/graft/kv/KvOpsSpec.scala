package graft.kv

import graft.SparkSpec

/** Differential test of the distributed replay against an in-memory
  * sequential oracle implementing the reference's per-key step function
  * (models/kv.go:40-54: Get returns state, Put replaces, Append
  * concatenates, initial state ""), with exactly-once dedup by
  * (clientId, clientSeq) (kvraft/test_test.go:85-96). Mirrors the
  * reference's GenericTest randomized-workload strategy
  * (kvraft/test_test.go:154-295) in batch form.
  */
class KvOpsSpec extends SparkSpec {

  /** The sequential spec: fold ops in seq order, dedup first. */
  private def oracle(ops: Seq[KvOp]): (Map[String, (String, Long)], Seq[KvRead]) = {
    var state = Map.empty[String, String].withDefaultValue("")
    var applied = Map.empty[String, Long].withDefaultValue(0L)
    val seen = scala.collection.mutable.HashSet.empty[(Long, Long)]
    val reads = Seq.newBuilder[KvRead]
    ops.sortBy(_.seq).foreach { o =>
      if (seen.add((o.clientId, o.clientSeq))) {
        o.op match {
          case "get"    => reads += KvRead(o.seq, o.key, state(o.key))
          case "put"    => state += o.key -> o.value; applied += o.key -> (applied(o.key) + 1)
          case "append" => state += o.key -> (state(o.key) + o.value); applied += o.key -> (applied(o.key) + 1)
        }
      }
    }
    val keys = ops.map(_.key).distinct
    (keys.map(k => k -> (state(k), applied(k))).toMap, reads.result())
  }

  private val rnd = new scala.util.Random(7)
  private val opsPool = Seq("get", "put", "append")
  private val keyPool = Seq("a", "b", "c")

  test("distributed replay matches the sequential models/kv.go fold") {
    (1 to 8).foreach { _ =>
      val base = (0 until 60).map { i =>
        val op = opsPool(rnd.nextInt(3))
        KvOp(i.toLong, rnd.nextInt(4).toLong, i.toLong, op, keyPool(rnd.nextInt(3)),
          if (op == "get") "" else rnd.alphanumeric.take(3).mkString)
      }
      // duplicate deliveries of every 5th op, arriving later (K4)
      val ops = base ++ base.filter(_.seq % 5 == 0).map(o => o.copy(seq = o.seq + 1000))
      import spark.implicits._
      val ds = spark.createDataset(ops).repartition(4)
      val (expState, expReads) = oracle(ops)

      val gotState = KvOps.replay(ds).collect()
        .map(s => s.key -> (s.value, s.n_applied)).toMap
      assert(gotState == expState)

      val gotReads = KvOps.reads(ds).collect().sortBy(_.seq).toSeq
      assert(gotReads == expReads.sortBy(_.seq))
    }
  }

  test("snapshot + incremental replay equals full replay (log compaction)") {
    import spark.implicits._
    (1 to 5).foreach { _ =>
      val base = (0 until 80).map { i =>
        val op = opsPool(rnd.nextInt(3))
        KvOp(i.toLong, rnd.nextInt(4).toLong, i.toLong, op, keyPool(rnd.nextInt(3)),
          if (op == "get") "" else rnd.alphanumeric.take(3).mkString)
      }
      // clerk-shaped retries: re-deliver every 6th op later
      val ops = base ++ base.filter(_.seq % 6 == 0).map(o => o.copy(seq = o.seq + 500))
      val cut = 20 + rnd.nextInt(50)
      val (prefix, suffix) = ops.partition(_.seq < cut)

      val full = KvOps.replay(spark.createDataset(ops)).collect()
        .map(s => s.key -> ((s.value, s.n_applied))).toMap
      val snaps = KvOps.snapshot(spark.createDataset(prefix))
      val incr = KvOps.replayFrom(snaps, spark.createDataset(suffix)).collect()
        .map(s => s.key -> ((s.value, s.n_applied))).toMap
      // keys only in the prefix still exist with their snapshot state
      val prefixOnly = full.keySet -- incr.keySet
      val snapMap = snaps.collect().map(s => s.key -> ((s.value, s.n_applied))).toMap
      assert(incr ++ prefixOnly.map(k => k -> snapMap(k)) == full)
    }
  }

  /** The reference's compaction size discipline (kvraft/test_test.go:152,
    * 278: raft log stays ≤ 8× maxraftstate after snapshotting, i.e.
    * retained bytes track STATE, never history length) rendered as a
    * batch property: compacting an append-heavy log must retain
    * O(live keys + clients) — snapshot rows = live keys, dedup marks ≤
    * keys × clients, and the only retained payload that grows with the
    * log is the KV state the appends genuinely built. Growing the log 4×
    * with the same key/client working set must leave every non-state
    * byte of the snapshot unchanged.
    */
  test("snapshot size is bounded by state, not by discarded log length") {
    import spark.implicits._
    val keys = Seq("a", "b", "c", "d", "e")
    val clients = 4
    def log(nOps: Int): Seq[KvOp] = {
      val r = new scala.util.Random(13)
      (0 until nOps).map { i =>
        KvOp(i.toLong, r.nextInt(clients).toLong, i.toLong, "append",
          keys(r.nextInt(keys.size)), r.alphanumeric.take(3).mkString)
      }
    }
    def measure(ops: Seq[KvOp]): (Long, Long, Long, Long) = {
      val snaps = KvOps.snapshot(spark.createDataset(ops)).collect()
      val rows = snaps.length.toLong
      val marks = snaps.map(_.clientMarks.size.toLong).sum
      val stateBytes = snaps.map(_.value.length.toLong).sum
      // every retained byte that is NOT the live KV state: keys, counts,
      // and the per-client watermarks (16 bytes per (id, seq) entry)
      val overhead = snaps.map(s =>
        s.key.length.toLong + 8L + 16L * s.clientMarks.size).sum
      (rows, marks, stateBytes, overhead)
    }
    val (rows1, marks1, state1, over1) = measure(log(500))
    val (rows4, marks4, state4, over4) = measure(log(2000))
    assert(rows1 == keys.size.toLong && rows4 == keys.size.toLong,
      "snapshot rows must equal live keys, independent of log length")
    assert(marks1 <= keys.size.toLong * clients && marks4 <= keys.size.toLong * clients,
      "dedup watermarks must stay O(keys x clients)")
    assert(over4 == over1,
      s"non-state snapshot bytes grew with the log: $over1 -> $over4")
    // the state itself grows with applied appends — that is the data,
    // not compaction overhead; the discipline is overhead << discarded
    // log (the reference's 8x headroom, met here by orders of magnitude)
    val discardedLogBytes4 = log(2000).map(o =>
      o.key.length + o.value.length + 24L).sum
    assert(over4 * 8 <= discardedLogBytes4,
      s"retained overhead $over4 not within 1/8 of discarded log $discardedLogBytes4")
    assert(state4 > state1, "sanity: more appends build more state")
  }

  test("dedup drops re-deliveries: an append applies exactly once") {
    import spark.implicits._
    val ops = Seq(
      KvOp(1, 1, 1, "append", "k", "A"),
      KvOp(2, 1, 1, "append", "k", "A"), // same (clientId, clientSeq)
      KvOp(3, 1, 2, "append", "k", "B"))
    val st = KvOps.replay(spark.createDataset(ops)).collect().head
    assert(st.value == "AB" && st.n_applied == 2)
  }
}
