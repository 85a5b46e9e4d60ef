package graft.kv

import scala.collection.immutable.BitSet
import scala.collection.mutable

/** One completed operation of a concurrent history: invocation/response
  * interval + observed output (ref: porcupine/model.go:5-11,
  * kvraft/test_test.go:327-371).
  */
final case class HistOp(
    clientId: Long,
    op: String, // get | put | append
    key: String,
    value: String, // input value (put/append)
    output: String, // observed value (get)
    call: Long, // invocation timestamp
    ret: Long) // response timestamp

/** Porcupine-style linearizability checker for the KV model,
  * re-implemented from the published algorithm (Wing & Gong DFS with
  * memoized (done-set, state) pairs — porcupine/checker.go:174-249) and
  * the reference's sequential specification (models/kv.go:40-54: Get
  * returns state, Put replaces, Append concatenates, initial "").
  *
  * Exploits P-compositionality exactly like the reference's model
  * (models/kv.go:18-34): a history is linearizable iff each per-key
  * sub-history is, so the search partitions by key first.
  */
object LinCheck {

  /** The sequential step function (models/kv.go:40-54). Returns the new
    * state, or None if the observed output is impossible.
    */
  def step(o: HistOp, state: String): Option[String] = o.op match {
    case "get"    => if (o.output == state) Some(state) else None
    case "put"    => Some(o.value)
    case "append" => Some(state + o.value)
    case other    => throw new IllegalArgumentException(s"unknown op $other")
  }

  /** True iff the full history is linearizable w.r.t. the KV model. */
  def check(history: Seq[HistOp]): Boolean =
    history.groupBy(_.key).values.forall(ops => checkKey(ops.toIndexedSeq))

  /** Three-valued verdict of the budgeted check, mirroring porcupine's
    * CheckOperationsTimeout contract (porcupine/porcupine.go — Ok /
    * Illegal / Unknown-on-timeout; the reference runs every history
    * under a 1 s budget, kvraft/test_test.go:20).
    */
  sealed trait LinResult
  case object LinOk extends LinResult
  case object LinIllegal extends LinResult
  case object LinUnknown extends LinResult

  private final class BudgetExceeded extends RuntimeException

  /** Budgeted, parallel-partition check: each per-key sub-history (the
    * model's P-compositional partition, models/kv.go:18-34) is searched
    * on its own task, all sharing one wall-clock budget — the harness
    * fidelity the reference gets from porcupine's per-partition
    * goroutines + timeout channel (porcupine/checker.go:174-249).
    * Illegal dominates (a found violation is a fact regardless of other
    * partitions timing out); otherwise any exhausted partition makes the
    * verdict Unknown.
    */
  def checkTimeout(history: Seq[HistOp], budgetMillis: Long): LinResult = {
    import scala.concurrent.Future
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.util.{Failure, Success}
    val deadline = System.nanoTime() + budgetMillis * 1000000L
    val parts = history.groupBy(_.key).values.map(_.toIndexedSeq).toSeq
    val futures = parts.map(p => Future(
      try Some(checkKey(p, deadline))
      catch { case _: BudgetExceeded => None }))
    // poll completion order so a found violation returns IMMEDIATELY
    // (porcupine's killSwitch behavior) instead of waiting out slower
    // partitions; unfinished searches self-abort at the shared deadline
    val pending = mutable.Set.from(futures)
    var unknown = false
    val graceNs = 100000000L // post-deadline slack for the self-abort
    while (pending.nonEmpty) {
      pending.filter(_.isCompleted).foreach { f =>
        pending -= f
        f.value.get match {
          case Success(Some(false)) => return LinIllegal
          case Success(Some(true))  => ()
          case Success(None)        => unknown = true
          case Failure(_)           => unknown = true
        }
      }
      if (pending.nonEmpty) {
        if (System.nanoTime() > deadline + graceNs) return LinUnknown
        Thread.sleep(1)
      }
    }
    if (unknown) LinUnknown else LinOk
  }

  private def checkKey(
      ops: IndexedSeq[HistOp], deadline: Long = Long.MaxValue): Boolean = {
    val n = ops.size
    if (n == 0) return true
    val seen = mutable.HashSet.empty[(BitSet, String)]

    def dfs(done: BitSet, state: String): Boolean = {
      if (deadline != Long.MaxValue && System.nanoTime() > deadline)
        throw new BudgetExceeded
      if (done.size == n) return true
      if (!seen.add((done, state))) return false
      // an op may linearize next only if it was invoked before every
      // remaining op had returned (it overlaps the earliest response)
      var minRet = Long.MaxValue
      var i = 0
      while (i < n) {
        if (!done(i) && ops(i).ret < minRet) minRet = ops(i).ret
        i += 1
      }
      (0 until n).exists { j =>
        !done(j) && ops(j).call <= minRet &&
          step(ops(j), state).exists(s2 => dfs(done + j, s2))
      }
    }
    dfs(BitSet.empty, "")
  }

  /** The reference's append invariants (checkClntAppends,
    * kvraft/test_test.go:80-97): in a final observed value, every
    * client's appends appear (a) at most once and (b) in issue order.
    * Returns the violations (empty = ok).
    */
  def checkClientAppends(
      finalValue: String,
      appendsByClient: Map[Long, Seq[String]]): Seq[String] =
    appendsByClient.flatMap { case (client, vs) =>
      var from = 0
      val issues = Seq.newBuilder[String]
      vs.zipWithIndex.foreach { case (v, j) =>
        val at = finalValue.indexOf(v, from)
        if (at < 0)
          issues += s"client $client append #$j ('$v') missing or out of order"
        else {
          if (finalValue.indexOf(v, at + 1) >= 0)
            issues += s"client $client append #$j ('$v') duplicated"
          from = at + v.length
        }
      }
      issues.result()
    }.toSeq
}
