package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.kv.{KvOp, KvOps}

/** Streaming KV state machine and watermarked windows, driven through
  * MemoryStream micro-batches — mirrors the reference's continuous
  * client workloads (kvraft/test_test.go:154-295) in streaming form.
  */
class KvStreamSpec extends SparkSpec {

  import spark.implicits._

  private def ops(seq: Long, c: Long, op: String, k: String, v: String) =
    KvOp(seq, c, seq, op, k, v)

  test("flatMapGroupsWithState applies puts/appends with exactly-once dedup across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KvOp]
    val q = KvStream.updates(in.toDS())
      .writeStream.format("memory").queryName("kv_updates")
      .outputMode(OutputMode.Update()).start()

    // batch 1: two appends + a re-delivery of the first (dedup)
    in.addData(
      ops(1, 1, "append", "a", "X"),
      KvOp(10, 1, 1, "append", "a", "X"), // same (clientId, clientSeq)
      ops(2, 2, "append", "a", "Y"))
    q.processAllAvailable()
    // batch 2: put replaces, then append on the new value
    in.addData(ops(3, 1, "put", "a", "P"), ops(4, 2, "append", "a", "Q"))
    q.processAllAvailable()

    val vals = spark.table("kv_updates").as[KvStream.KvUpdate]
      .collect().sortBy(_.appliedSeq)
    q.stop()
    assert(vals.map(_.value).toSeq == Seq("X", "XY", "P", "PQ"))
  }

  test("streaming final state agrees with the batch replay on the same log") {
    val log = Seq(
      ops(1, 1, "put", "k1", "a"),
      ops(2, 1, "append", "k1", "b"),
      ops(3, 2, "append", "k2", "z"),
      KvOp(9, 1, 2, "append", "k1", "b"), // dup of seq 2
      ops(4, 2, "put", "k2", "w"),
      ops(5, 3, "get", "k3", "")) // get-only key: state "" must still appear
    val ds = spark.createDataset(log)
    val streaming = KvStream.finalStates(ds).collect()
      .map(s => s.key -> s.value).toMap
    val batch = KvOps.replay(ds).collect().map(s => s.key -> s.value).toMap
    assert(streaming == batch)
    assert(batch == Map("k1" -> "ab", "k2" -> "w", "k3" -> ""))
  }

  test("watermarked hourly windows aggregate and drop late rows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val df = in.toDS().toDF("ts", "user_id", "event_type", "value")
    val q = EventWindows.hourly(df, "1 hour")
      .writeStream.format("memory").queryName("ev_hourly")
      .outputMode(OutputMode.Append()).start()

    def t(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    in.addData((t(10, 5), 1L, "click", 1.0), (t(10, 40), 2L, "click", 2.0))
    q.processAllAvailable()
    // advance watermark well past the 10:00 window (12:30 - 1h > 11:00)
    in.addData((t(12, 30), 3L, "click", 4.0))
    q.processAllAvailable()
    // this row is older than the watermark → dropped
    in.addData((t(10, 50), 4L, "click", 8.0))
    q.processAllAvailable()
    // close the 12:00 window so it flushes in Append mode
    in.addData((t(14, 0), 5L, "click", 16.0))
    q.processAllAvailable()

    val rows = spark.table("ev_hourly")
      .select($"hour", $"n", $"total_value").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
    val dropped = EventWindows.droppedByWatermark(q)
    q.stop()
    assert(rows.contains((t(10, 0), 2L, 3.0)), s"got $rows") // late 8.0 excluded
    assert(rows.contains((t(12, 0), 1L, 4.0)), s"got $rows")
    // the loss is METERED, not inferred from the row's absence
    assert(dropped == 1L, s"expected exactly the one late row dropped, got $dropped")
  }
}
