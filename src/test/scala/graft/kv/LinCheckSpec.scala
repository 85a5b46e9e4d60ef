package graft.kv

import org.scalatest.funsuite.AnyFunSuite

/** Linearizability checker validation: hand-built histories with known
  * verdicts, randomized linearizable histories (generated from a true
  * sequential execution with widened intervals — must accept), and
  * corrupted ones (must reject). Mirrors GenericTestLinearizability
  * (kvraft/test_test.go:296-446) in batch form.
  */
class LinCheckSpec extends AnyFunSuite {

  private def op(c: Long, o: String, k: String, v: String, out: String,
      call: Long, ret: Long) = HistOp(c, o, k, v, out, call, ret)

  test("sequential read-your-writes history is linearizable") {
    assert(LinCheck.check(Seq(
      op(1, "put", "k", "A", "", 0, 1),
      op(1, "append", "k", "B", "", 2, 3),
      op(2, "get", "k", "", "AB", 4, 5))))
  }

  test("a stale read that no interleaving explains is rejected") {
    assert(!LinCheck.check(Seq(
      op(1, "put", "k", "A", "", 0, 1),
      op(2, "get", "k", "", "", 2, 3)))) // must see "A"
  }

  test("overlapping ops may linearize in either order") {
    // get overlaps the put: both "" and "A" are valid reads
    assert(LinCheck.check(Seq(
      op(1, "put", "k", "A", "", 0, 10),
      op(2, "get", "k", "", "", 1, 2))))
    assert(LinCheck.check(Seq(
      op(1, "put", "k", "A", "", 0, 10),
      op(2, "get", "k", "", "A", 1, 2))))
  }

  test("non-overlapping order is enforced") {
    // put returned before the get was invoked → get must see "A"
    assert(!LinCheck.check(Seq(
      op(1, "put", "k", "A", "", 0, 1),
      op(2, "get", "k", "", "", 5, 6))))
  }

  test("randomized linearizable histories are accepted; corrupted gets are rejected") {
    val rnd = new scala.util.Random(11)
    (1 to 30).foreach { _ =>
      // generate a true sequential execution over 2 keys
      var state = Map("a" -> "", "b" -> "").withDefaultValue("")
      val ops = (0 until 14).map { i =>
        val k = if (rnd.nextBoolean()) "a" else "b"
        val t0 = i * 10L
        rnd.nextInt(3) match {
          case 0 =>
            val v = s"v$i."
            state += k -> v
            op(rnd.nextInt(3).toLong, "put", k, v, "", t0, t0 + rnd.nextInt(15))
          case 1 =>
            val v = s"w$i."
            state += k -> (state(k) + v)
            op(rnd.nextInt(3).toLong, "append", k, v, "", t0, t0 + rnd.nextInt(15))
          case _ =>
            op(rnd.nextInt(3).toLong, "get", k, "", state(k), t0, t0 + rnd.nextInt(15))
        }
      }
      assert(LinCheck.check(ops), s"should accept: $ops")

      // corrupt one get's output → must reject
      val gi = ops.indexWhere(o => o.op == "get" && o.output.nonEmpty)
      if (gi >= 0) {
        val bad = ops.updated(gi, ops(gi).copy(output = ops(gi).output + "CORRUPT"))
        assert(!LinCheck.check(bad), s"should reject: $bad")
      }
    }
  }

  test("append invariants: present once, in order (checkClntAppends parity)") {
    assert(LinCheck.checkClientAppends("x1.x2.y1.",
      Map(1L -> Seq("x1.", "x2."), 2L -> Seq("y1."))).isEmpty)
    assert(LinCheck.checkClientAppends("x2.x1.",
      Map(1L -> Seq("x1.", "x2."))).nonEmpty) // out of order
    assert(LinCheck.checkClientAppends("x1.x1.",
      Map(1L -> Seq("x1."))).nonEmpty) // duplicated
  }

  test("the batch replay produces a linearizable history end-to-end") {
    // derive a history from KvOps semantics: each applied op is a
    // zero-width interval at its seq; reads carry the observed state
    val log = Seq(
      KvOp(1, 1, 1, "put", "k", "A"),
      KvOp(2, 1, 2, "append", "k", "B"),
      KvOp(3, 2, 3, "get", "k", ""),
      KvOp(4, 2, 4, "append", "k", "C"),
      KvOp(5, 1, 5, "get", "k", ""))
    var st = ""
    val hist = log.map { o =>
      val out = if (o.op == "get") st else ""
      if (o.op == "put") st = o.value
      if (o.op == "append") st = st + o.value
      HistOp(o.clientId, o.op, o.key, o.value, out, o.seq, o.seq)
    }
    assert(LinCheck.check(hist))
  }

  test("budgeted parallel check: Ok within budget, per-key partitions") {
    // 50 keys × 6 sequential ops each — trivially linearizable, checked
    // as 50 parallel partitions under the reference's 1 s budget
    val hist = (0 until 50).flatMap { k =>
      var t = 0L
      Seq("put" -> "A", "append" -> "B", "get" -> "AB",
        "append" -> "C", "get" -> "ABC", "put" -> "Z").map { case (o, v) =>
        t += 2
        if (o == "get") op(1, o, s"k$k", "", v, t, t + 1)
        else op(1, o, s"k$k", v, "", t, t + 1)
      }
    }
    assert(LinCheck.checkTimeout(hist, 1000L) == LinCheck.LinOk)
  }

  test("budgeted check: an illegal partition dominates other Ok keys") {
    val hist = Seq(
      op(1, "put", "good", "A", "", 0, 1),
      op(2, "get", "good", "", "A", 2, 3),
      op(1, "put", "bad", "A", "", 0, 1),
      op(2, "get", "bad", "", "", 2, 3)) // stale read, no interleaving
    assert(LinCheck.checkTimeout(hist, 1000L) == LinCheck.LinIllegal)
  }

  test("budgeted check: an exhausted budget yields Unknown, not a verdict") {
    val hist = Seq(
      op(1, "put", "k", "A", "", 0, 10),
      op(2, "get", "k", "", "", 1, 2))
    assert(LinCheck.checkTimeout(hist, 0L) == LinCheck.LinUnknown)
  }
}
