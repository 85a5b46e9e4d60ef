package graft.kv

import scala.util.Random

import graft.SparkSpec
import graft.streaming.KvStream

/** Concurrent-history linearizability at test scale — the analogue of
  * the reference's GenericTestLinearizability (kvraft/test_test.go:
  * 296-446): randomized concurrent client workloads produce overlapping
  * invocation/response intervals; the ENGINE's observed outputs (get
  * views from the replay fold, final values from the streaming state
  * machine) are fed to the Wing–Gong checker, which must accept them —
  * and must reject targeted corruptions, proving the checker has teeth.
  *
  * Interval generation: op at global log position s linearizes at time
  * 10·s; call/ret are jittered ±8 around it, so adjacent ops overlap
  * (width > gap), then per-client clamping restores the one-outstanding-
  * op-per-client invariant the reference's clerks obey
  * (kvraft/client.go:30-31). The linearization point provably stays
  * inside every interval, so a correct engine always admits a witness.
  */
class LinHistorySpec extends SparkSpec {

  private val Keys = "abcdefgh".map(_.toString)

  /** One generated workload: the op log plus per-op jittered intervals. */
  private final case class GenOp(op: KvOp, call: Long, ret: Long)

  /** @param withPuts mirror of the reference's two mixes: the
    *   linearizability tests add puts (kvraft/test_test.go:352-356);
    *   the append-invariant tests are append/get only — a put wipes
    *   prior appends and would invalidate checkClntAppends
    *   (kvraft/test_test.go:207, 80-97).
    */
  private def genWorkload(
      seed: Long, nClients: Int, opsPerClient: Int,
      withPuts: Boolean = true): Seq[GenOp] = {
    val rnd = new Random(seed)
    val perClient = (0 until nClients).map { c =>
      (0 until opsPerClient).map { _ =>
        val r = rnd.nextInt(10)
        val op =
          if (r < 5) "append"
          else if (r < 8 || !withPuts) "get"
          else "put"
        (c.toLong, op, Keys(rnd.nextInt(Keys.size)))
      }
    }
    // clientSeq must be assigned in GLOBAL issue order after the
    // interleave: a clerk issues one op at a time with increasing
    // clientSeq (kvraft/client.go:30-31) — the watermark dedup in the
    // streaming engine correctly treats an out-of-order clientSeq as a
    // stale retry and drops it.
    val counters = scala.collection.mutable.Map.empty[Long, Long]
    val interleaved = rnd.shuffle(perClient.flatten).zipWithIndex.map {
      case ((cli, op, key), seq) =>
        val cseq = counters.getOrElse(cli, 0L)
        counters(cli) = cseq + 1
        val value = if (op == "get") "" else s"x$cli.${cseq}y"
        val s = seq.toLong
        GenOp(KvOp(s, cli, cseq, op, key, value),
          10 * s - rnd.nextInt(9), 10 * s + rnd.nextInt(9))
    }
    // per-client clamp: consecutive ops of one client must not overlap
    // (a clerk has at most one op outstanding)
    interleaved.groupBy(_.op.clientId).values.flatMap { ops =>
      var prevRet = Long.MinValue
      ops.sortBy(_.op.seq).map { g =>
        val call = math.max(g.call, prevRet + 1)
        val ret = math.max(g.ret, call)
        prevRet = ret
        g.copy(call = call, ret = ret)
      }
    }.toSeq.sortBy(_.op.seq)
  }

  /** Run the log through the engine and assemble the checkable history:
    * get outputs from [[KvOps.reads]] (the replay fold's observed
    * values), write outputs empty (the model ignores them).
    */
  private def observedHistory(workload: Seq[GenOp]): Seq[HistOp] = {
    import spark.implicits._
    val ops = spark.createDataset(workload.map(_.op))
    val observed = KvOps.reads(ops).collect().map(r => r.seq -> r.observed).toMap
    workload.map { g =>
      HistOp(g.op.clientId, g.op.op, g.op.key, g.op.value,
        if (g.op.op == "get") observed(g.op.seq) else "", g.call, g.ret)
    }
  }

  test("engine-observed histories from randomized concurrent workloads are linearizable") {
    for (seed <- Seq(1L, 42L, 20260812L)) {
      val workload = genWorkload(seed, nClients = 30, opsPerClient = 40)
      val history = observedHistory(workload)
      assert(history.count(_.op == "get") > 100, "workload should exercise reads")
      assert(LinCheck.check(history), s"engine history not linearizable (seed $seed)")
    }
  }

  test("the checker rejects a corrupted get observation") {
    val workload = genWorkload(7L, nClients = 10, opsPerClient = 20)
    val history = observedHistory(workload)
    val i = history.indexWhere(_.op == "get")
    assert(i >= 0)
    // no concatenation of x<cli>.<seq>y tokens ever contains '!'
    val corrupted = history.updated(i, history(i).copy(output = history(i).output + "!CORRUPT"))
    assert(!LinCheck.check(corrupted))
  }

  test("streaming final states satisfy the per-client append invariants") {
    import spark.implicits._
    val workload = genWorkload(99L, nClients = 20, opsPerClient = 30, withPuts = false)
    val ops = spark.createDataset(workload.map(_.op))
    // the flatMapGroupsWithState state machine (batch-driven), i.e.
    // KvStream.updates underneath — the live engine's answer
    val finals = KvStream.finalStates(ops).collect().map(s => s.key -> s.value).toMap
    val appendsByKeyClient = workload.map(_.op)
      .filter(_.op == "append")
      .groupBy(o => (o.key, o.clientId))
    for (key <- Keys) {
      val byClient = appendsByKeyClient.collect {
        case ((`key`, cli), ops) => cli -> ops.sortBy(_.seq).map(_.value)
      }.toMap
      val issues = LinCheck.checkClientAppends(finals.getOrElse(key, ""), byClient)
      assert(issues.isEmpty, s"key $key: ${issues.mkString("; ")}")
    }
  }

  test("the append checker flags a duplicated append") {
    import spark.implicits._
    val base = genWorkload(5L, nClients = 5, opsPerClient = 10, withPuts = false).map(_.op)
    // a buggy engine double-applies one append: model it by appending the
    // same payload twice under distinct clientSeqs (so dedup admits both)
    val victim = base.find(_.op == "append").get
    val dup = victim.copy(seq = base.map(_.seq).max + 1, clientSeq = 1000L)
    val ops = spark.createDataset(base :+ dup)
    val finals = KvOps.replay(ops).collect().map(s => s.key -> s.value).toMap
    val issues = LinCheck.checkClientAppends(
      finals(victim.key),
      Map(victim.clientId -> Seq(victim.value)))
    assert(issues.exists(_.contains("duplicated")))
  }
}
