package graft.shard

import org.scalatest.funsuite.AnyFunSuite

import Sharding._

/** Invariant properties of the rebalance algorithm, ported from the
  * reference's shardmaster test suite:
  *  - balance: max−min ≤ 1 across live groups (shardmaster/test_test.go:35-52)
  *  - no orphan shards: every shard maps to a live gid (:25-32)
  *  - minimal movement: moved = NShards − Σ min(current, target)
  *  - Move sticks and bumps Config.Num (:137-176)
  */
class ShardingSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private def randGids(): Seq[Int] =
    rnd.shuffle((1 to 20).toList).take(1 + rnd.nextInt(6))

  private def counts(shards: Vector[Int]): Map[Int, Int] =
    shards.groupBy(identity).view.mapValues(_.size).toMap

  private def checkBalance(c: ShardConfig): Unit = {
    if (c.groups.nonEmpty) {
      val per = c.groups.keys.map(g => c.shards.count(_ == g))
      assert(per.max - per.min <= 1, s"unbalanced: $c")
      assert(c.shards.forall(c.groups.contains), s"orphan shard: $c")
    }
  }

  test("join then leave sequences keep balance and never orphan a shard") {
    (1 to 200).foreach { _ =>
      val steps = List.fill(6)(randGids())
      var c = initial
      steps.zipWithIndex.foreach { case (gids, i) =>
        c =
          if (i % 2 == 0) join(c, gids.map(g => g -> Seq(s"srv$g")).toMap)
          else leave(c, gids)
        checkBalance(c)
        assert(c.num == i + 1)
      }
    }
  }

  test("rebalance moves the minimal number of shards") {
    (1 to 200).foreach { _ =>
      val (first, second) = (randGids(), randGids())
      val c1 = join(initial, first.map(g => g -> Seq(s"srv$g")).toMap)
      val c2 = join(c1, second.map(g => g -> Seq(s"srv$g")).toMap)
      val live = c2.groups.keySet.toSeq
      val before = counts(c1.shards)
      // optimum over all balanced targets: each group may keep up to
      // base shards, plus `extra` groups may keep one more — best case
      // gives the +1 to groups already holding ≥ base+1.
      val base = NShards / live.size
      val extra = NShards % live.size
      val optStay = live.map(g => math.min(before.getOrElse(g, 0), base)).sum +
        math.min(extra, live.count(g => before.getOrElse(g, 0) >= base + 1))
      val moved = c1.shards.zip(c2.shards).count { case (a, b) => a != b }
      assert(moved == NShards - optStay, s"non-minimal movement: $c1 -> $c2")
    }
  }

  test("move sticks and bumps the config number") {
    val c1 = join(initial, Map(1 -> Seq("a"), 2 -> Seq("b")))
    val c2 = move(c1, 7, 2)
    assert(c2.shards(7) == 2 && c2.num == c1.num + 1)
  }

  test("query returns the requested config, or latest for -1/out of range") {
    val h = scriptedHistory
    assert(query(h, 2) == h(2))
    assert(query(h, -1) == h.last)
    assert(query(h, 99) == h.last)
  }

  /** Concurrent-clerk analogue of the reference's TestMulti
    * (shardmaster/test_test.go:252-380): N clerk threads issue
    * interleaved Join/Leave/Move through ONE sequenced config log (the
    * synchronized append is this repo's driver-sequencing contract —
    * the shardmaster's raft log in the reference). Every epoch of the
    * resulting history must satisfy the config invariants, and
    * replaying the serialized op sequence cold must reproduce the
    * history byte-for-byte (the log IS the serialization).
    */
  test("interleaved Join/Leave/Move from concurrent clerks hold every epoch's invariants") {
    import Sharding._
    sealed trait Op
    case class J(groups: Map[Int, Seq[String]]) extends Op
    case class L(gids: Seq[Int]) extends Op
    case class M(shard: Int, gid: Int) extends Op
    val history = scala.collection.mutable.ArrayBuffer(initial)
    val log = scala.collection.mutable.ArrayBuffer.empty[Op]
    val lock = new Object
    def clerk(t: Int): Runnable = () => {
      val gidA = 10 + t * 2
      val gidB = 11 + t * 2
      def issue(op: Op): Unit = lock.synchronized {
        val cur = history.last
        val next = op match {
          case J(g) => join(cur, g)
          case L(g) => leave(cur, g)
          case M(sh, g) => move(cur, sh, g)
        }
        history += next
        log += op
      }
      issue(J(Map(gidA -> Seq(s"srv$gidA-a", s"srv$gidA-b"))))
      issue(J(Map(gidB -> Seq(s"srv$gidB-a"))))
      // move targets this clerk's OWN still-live group — mirrors the
      // reference clerks moving shards among gids they know are joined
      issue(M(t % NShards, gidA))
      issue(L(Seq(gidB)))
    }
    val threads = (0 until 6).map(t => new Thread(clerk(t)))
    threads.foreach(_.start())
    threads.foreach(_.join())

    assert(history.size == 1 + 6 * 4)
    // per-epoch invariants (the reference's check(), per config)
    history.zipWithIndex.foreach { case (c, i) =>
      assert(c.num == i, s"config nums must be dense: ${c.num} at epoch $i")
      assert(c.shards.size == NShards)
      if (c.groups.isEmpty) assert(c.shards.forall(_ == 0))
      else assert(c.shards.forall(c.groups.keySet),
        s"orphan shard at epoch $i: ${c.shards} vs ${c.groups.keySet}")
    }
    // balance max-min <= 1 after every REBALANCING epoch (join/leave);
    // move epochs deliberately break balance until the next rebalance
    (log.zipWithIndex).foreach { case (op, k) =>
      val c = history(k + 1)
      op match {
        case J(_) | L(_) if c.groups.nonEmpty =>
          val counts = c.groups.keySet.toSeq.map(g => c.shards.count(_ == g))
          assert(counts.max - counts.min <= 1,
            s"unbalanced after epoch ${k + 1} ($op): ${c.shards}")
        case M(sh, g) =>
          assert(c.shards(sh) == g, s"move did not stick at epoch ${k + 1}")
        case _ => ()
      }
    }
    // final membership: every clerk's A group survives, every B left
    val finalGroups = history.last.groups.keySet
    assert(finalGroups == (0 until 6).map(t => 10 + t * 2).toSet)
    // determinism: cold replay of the serialized log reproduces history
    val replayed = log.foldLeft(Vector(initial)) { (h, op) =>
      h :+ (op match {
        case J(g) => join(h.last, g)
        case L(g) => leave(h.last, g)
        case M(sh, g) => move(h.last, sh, g)
      })
    }
    assert(replayed == history.toVector,
      "replaying the sequenced op log must reproduce the history exactly")
  }

  test("key2shard parity with the reference: first byte mod 10") {
    assert(key2shard("a") == 97 % 10)
    assert(key2shard("") == 0)
    assert(key2shard("z9") == 122 % 10)
  }

  test("scripted history matches the hand-traced greedy assignments") {
    // Independently hand-traced through the documented algorithm; the
    // kv_migration oracle's cfg VALUES (KvQueries.CfgCte) embeds these
    // same vectors, so this test ties oracle and implementation to the
    // one trace.
    val h = scriptedHistory
    assert(h(1).shards == Vector(1, 1, 1, 1, 2, 2, 2, 3, 3, 3))
    assert(h(2).shards == Vector(1, 1, 4, 4, 2, 2, 5, 3, 3, 5))
    assert(h(3).shards == Vector(1, 1, 4, 4, 1, 3, 5, 3, 3, 5))
    assert(h(4).shards == Vector(1, 1, 4, 1, 1, 3, 5, 3, 3, 5))
    assert(h.map(_.num) == Vector(0, 1, 2, 3, 4))
  }
}
