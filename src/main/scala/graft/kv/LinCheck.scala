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

  /** One step of a (partial) linearization: which op (index into the
    * key's op vector) linearized next, and the sequential state after
    * applying it.
    */
  final case class LinStep(index: Int, state: String)

  /** Per-key result of [[explain]]: whether a full witness exists, and
    * the witness order — complete when linearizable, otherwise the
    * LONGEST partial linearization the search reached (the debugging
    * artifact porcupine renders, ref: porcupine/visualization.go:31-60:
    * `PartialLinearizations` per partition).
    */
  final case class KeyExplanation(
      key: String,
      ops: IndexedSeq[HistOp],
      linearizable: Boolean,
      witness: Seq[LinStep])

  /** Explanation pass: the same Wing–Gong search as [[check]], but
    * recording the linearization order instead of just the verdict. A
    * debug tool for small failing histories — unbudgeted by design (run
    * [[checkTimeout]] first when the history might be adversarial).
    */
  def explain(history: Seq[HistOp]): Seq[KeyExplanation] =
    history.groupBy(_.key).toSeq.sortBy(_._1).map { case (k, os) =>
      explainKey(k, os.toIndexedSeq)
    }

  private def explainKey(key: String, ops: IndexedSeq[HistOp]): KeyExplanation = {
    val n = ops.size
    val seen = mutable.HashSet.empty[(BitSet, String)]
    var best: List[LinStep] = Nil
    var bestLen = -1
    def dfs(done: BitSet, state: String, acc: List[LinStep]): Boolean = {
      if (done.size > bestLen) { bestLen = done.size; best = acc }
      if (done.size == n) return true
      if (!seen.add((done, state))) return false
      var minRet = Long.MaxValue
      var i = 0
      while (i < n) {
        if (!done(i) && ops(i).ret < minRet) minRet = ops(i).ret
        i += 1
      }
      (0 until n).exists { j =>
        !done(j) && ops(j).call <= minRet &&
          step(ops(j), state).exists(s2 => dfs(done + j, s2, LinStep(j, s2) :: acc))
      }
    }
    val ok = dfs(BitSet.empty, "", Nil)
    KeyExplanation(key, ops, ok, best.reverse)
  }

  /** Self-contained HTML debug artifact — the analogue of porcupine's
    * interactive linearization visualization
    * (ref: porcupine/visualization.go:31-120): per key, one timeline row
    * per client with each op's [call, ret] interval, the (partial)
    * linearization order numbered on the bars, the sequential state each
    * step reached, and unlinearized ops flagged when the history is
    * illegal. One file, no external assets — open in any browser.
    */
  def writeVisualization(history: Seq[HistOp], path: String): Unit = {
    val parts = explain(history)
    // every JS-literal hazard, not just the common ones: control chars
    // (CR is a JS line terminator — raw, it truncates the string and
    // kills the whole inline script) and U+2028/U+2029 likewise
    def esc(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '<' => "\\u003c"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      // the separators written as unicode escapes, not raw chars: the
      // invisible JS line/paragraph separators are easy for tooling to
      // silently mangle
      case c if c < ' ' || c == '\u2028' || c == '\u2029' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val json = parts.map { p =>
      val ops = p.ops.map(o =>
        s"""{"clientId":${o.clientId},"op":"${esc(o.op)}","value":"${esc(o.value)}",""" +
          s""""output":"${esc(o.output)}","call":${o.call},"ret":${o.ret}}""")
        .mkString("[", ",", "]")
      val wit = p.witness.map(w =>
        s"""{"index":${w.index},"state":"${esc(w.state)}"}""").mkString("[", ",", "]")
      s"""{"key":"${esc(p.key)}","linearizable":${p.linearizable},"history":$ops,"witness":$wit}"""
    }.mkString("[", ",", "]")
    val html =
      s"""<!DOCTYPE html>
         |<html><head><meta charset="utf-8"><title>linearization</title><style>
         |body{font:13px monospace;margin:20px}
         |.key{margin:18px 0 4px;font-weight:bold}
         |.bad{color:#b00020}
         |svg{background:#fafafa;border:1px solid #ddd}
         |</style></head><body>
         |<h3>Linearization debug (Wing&ndash;Gong witness / longest partial)</h3>
         |<div id="root"></div>
         |<script>
         |const DATA = $json;
         |const root = document.getElementById('root');
         |for (const part of DATA) {
         |  const head = document.createElement('div');
         |  head.className = 'key' + (part.linearizable ? '' : ' bad');
         |  head.textContent = 'key "' + part.key + '" — ' +
         |    (part.linearizable ? 'linearizable (full witness)'
         |      : 'ILLEGAL — longest partial: ' + part.witness.length + '/' +
         |        part.history.length + ' ops');
         |  root.appendChild(head);
         |  const clients = [...new Set(part.history.map(o => o.clientId))].sort((a,b)=>a-b);
         |  const t0 = Math.min(...part.history.map(o => o.call));
         |  const t1 = Math.max(...part.history.map(o => o.ret));
         |  const W = 900, RH = 26, PAD = 60;
         |  const x = t => PAD + (W - PAD - 10) * (t - t0) / Math.max(1, t1 - t0);
         |  const order = new Map(part.witness.map((w, i) => [w.index, i]));
         |  const svgNS = 'http://www.w3.org/2000/svg';
         |  const svg = document.createElementNS(svgNS, 'svg');
         |  svg.setAttribute('width', W);
         |  svg.setAttribute('height', clients.length * RH + 10);
         |  part.history.forEach((o, idx) => {
         |    const row = clients.indexOf(o.clientId);
         |    const y = 5 + row * RH;
         |    const r = document.createElementNS(svgNS, 'rect');
         |    r.setAttribute('x', x(o.call)); r.setAttribute('y', y);
         |    r.setAttribute('width', Math.max(2, x(o.ret) - x(o.call)));
         |    r.setAttribute('height', RH - 8);
         |    const lin = order.has(idx);
         |    r.setAttribute('fill', lin ? '#7fb3d5' : '#f1948a');
         |    r.setAttribute('stroke', '#555');
         |    svg.appendChild(r);
         |    const t = document.createElementNS(svgNS, 'text');
         |    t.setAttribute('x', x(o.call) + 3); t.setAttribute('y', y + 13);
         |    t.setAttribute('font-size', '10');
         |    const badge = lin ? ('#' + (order.get(idx) + 1) + ' ') : '✗ ';
         |    t.textContent = badge + o.op + '(' + (o.op === 'get' ? '' : o.value) + ')' +
         |      (o.op === 'get' ? '→"' + o.output + '"' : '');
         |    svg.appendChild(t);
         |  });
         |  clients.forEach((c, row) => {
         |    const t = document.createElementNS(svgNS, 'text');
         |    t.setAttribute('x', 2); t.setAttribute('y', 5 + row * RH + 13);
         |    t.setAttribute('font-size', '10');
         |    t.textContent = 'c' + c;
         |    svg.appendChild(t);
         |  });
         |  root.appendChild(svg);
         |  const states = document.createElement('div');
         |  states.textContent = 'states: "" → ' +
         |    part.witness.map(w => '"' + w.state + '"').join(' → ');
         |  root.appendChild(states);
         |}
         |</script></body></html>
         |""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path),
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
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
