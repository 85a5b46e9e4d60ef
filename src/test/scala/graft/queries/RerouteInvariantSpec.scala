package graft.queries

import graft.SparkSpec

/** Conservation invariants of the ErrWrongGroup re-route model
  * (kv_reroute): every re-routed op was rejected exactly once, so the
  * wrong-first-attempt count must balance the re-routed count globally —
  * including rejections by groups that no longer serve anything (the
  * case the round-4 review caught being silently dropped).
  */
class RerouteInvariantSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("wrong first attempts balance re-routed arrivals; departed groups appear") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    import spark.implicits._
    val rows = graft.SparkEntry.queries("kv_reroute")(spark, dir)
      .select($"config_num", $"gid", $"n_ops", $"n_rerouted", $"n_wrong_first")
      .collect()
    val totalRerouted = rows.map(_.getLong(3)).sum
    val totalWrong = rows.map(_.getLong(4)).sum
    assert(totalRerouted > 0, "the scripted config history must move some shards")
    assert(totalWrong == totalRerouted,
      s"each rerouted op is rejected exactly once: wrong=$totalWrong rerouted=$totalRerouted")
    // the leave(2) transition (config 3) must surface group 2 as a pure
    // rejecter: it serves nothing but still bounces stale first attempts
    val departed = rows.filter(r => r.getInt(0) == 3 && r.getInt(1) == 2)
    assert(departed.length == 1, "group 2 must appear under config 3")
    assert(departed.head.getLong(2) == 0L, "group 2 serves nothing in config 3")
    assert(departed.head.getLong(4) > 0L, "group 2 must reject stale attempts")
    // epoch 0's cache is already current: config 1 rows re-route nothing
    rows.filter(_.getInt(0) == 1).foreach { r =>
      assert(r.getLong(3) == 0L && r.getLong(4) == 0L,
        s"epoch 0 must not re-route: $r")
    }
  }
}
