package graft.shard

/** Shard-routing metadata surface of the reference (K5–K10):
  * `key2shard` (ref: shardkv/client.go:22-29), `Config{Num,Shards,Groups}`
  * (ref: shardmaster/common.go:21-28), and Join/Leave/Move/Query with the
  * balance invariant max−min ≤ 1 and no orphan shards
  * (ref: shardmaster/test_test.go:25-52).
  *
  * Pure metadata functions — the Spark analogue of the reference's
  * shardmaster is a broadcast `ShardConfig` consulted by routing
  * expressions (see the `kv_key2shard` query); rebalancing never touches
  * data, only the assignment vector, exactly like Spark's own
  * `HashPartitioner` metadata.
  *
  * Rebalance is deterministic greedy with provably minimal movement:
  * the ceil-sized targets go to the groups currently holding the most
  * shards (ties → smaller gid), which maximizes Σ min(current, target);
  * surviving shards stay put; orphans go to the smallest-gid group below
  * target in shard order.
  */
object Sharding {

  val NShards = 10 // ref: shardmaster/common.go:21

  /** First byte of the key mod NShards (ref: shardkv/client.go:22-29). */
  def key2shard(key: String): Int =
    (if (key.isEmpty) 0 else key.charAt(0).toInt) % NShards

  /** Config #0: all shards on the sentinel gid 0 = unassigned
    * (ref: shardmaster/server.go:70-71).
    */
  final case class ShardConfig(
      num: Int,
      shards: Vector[Int],
      groups: Map[Int, Seq[String]])

  val initial: ShardConfig = ShardConfig(0, Vector.fill(NShards)(0), Map.empty)

  private def rebalance(cur: Vector[Int], gids: Seq[Int]): Vector[Int] = {
    if (gids.isEmpty) return Vector.fill(NShards)(0)
    val sortedGids = gids.distinct.sorted
    val n = sortedGids.size
    val base = NShards / n
    val extra = NShards % n
    val counts = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    cur.foreach(g => if (sortedGids.contains(g)) counts(g) += 1)
    // ceil targets to the currently-largest groups (minimal movement).
    val ceilSet = sortedGids.sortBy(g => (-counts(g), g)).take(extra).toSet
    val target = sortedGids.map(g => g -> (base + (if (ceilSet(g)) 1 else 0))).toMap
    val kept = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    val out = cur.toArray
    for (i <- 0 until NShards) {
      val g = out(i)
      if (target.contains(g) && kept(g) < target(g)) kept(g) += 1 else out(i) = -1
    }
    for (i <- 0 until NShards if out(i) == -1) {
      val g = sortedGids.find(g => kept(g) < target(g)).get
      out(i) = g
      kept(g) += 1
    }
    out.toVector
  }

  /** K7: add replica groups and rebalance. */
  def join(c: ShardConfig, newGroups: Map[Int, Seq[String]]): ShardConfig = {
    val groups = c.groups ++ newGroups
    ShardConfig(c.num + 1, rebalance(c.shards, groups.keys.toSeq), groups)
  }

  /** K8: remove groups, reassign their shards, keep balance. */
  def leave(c: ShardConfig, gids: Seq[Int]): ShardConfig = {
    val groups = c.groups -- gids
    ShardConfig(c.num + 1, rebalance(c.shards, groups.keys.toSeq), groups)
  }

  /** K9: force-assign one shard (no rebalance — the move sticks,
    * ref: shardmaster/test_test.go:137-176).
    */
  def move(c: ShardConfig, shard: Int, gid: Int): ShardConfig =
    ShardConfig(c.num + 1, c.shards.updated(shard, gid), c.groups)

  /** K10: config #num, or latest for num < 0 / out of range
    * (ref: shardmaster/client.go:31-46).
    */
  def query(history: IndexedSeq[ShardConfig], num: Int): ShardConfig =
    if (num < 0 || num >= history.size) history.last else history(num)

  /** The scripted config evolution used by the `shard_rebalance` query
    * (deterministic; the oracle pins its final assignment).
    */
  def scriptedHistory: IndexedSeq[ShardConfig] = {
    val c0 = initial
    val c1 = join(c0, Map(1 -> Seq("s1a", "s1b"), 2 -> Seq("s2a"), 3 -> Seq("s3a")))
    val c2 = join(c1, Map(4 -> Seq("s4a"), 5 -> Seq("s5a")))
    val c3 = leave(c2, Seq(2))
    val c4 = move(c3, 3, 1)
    Vector(c0, c1, c2, c3, c4)
  }
}
