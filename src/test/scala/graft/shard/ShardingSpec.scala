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
