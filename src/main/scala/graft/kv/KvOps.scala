package graft.kv

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One logged client operation — the declared KV surface of the reference
  * (ref: kvraft/common.go:12-33, kvraft/client.go:39-64; FIXTURES.md §3).
  * `seq` is the global log position (ordering is input, not discovered);
  * `(clientId, clientSeq)` identifies the logical client op for
  * exactly-once dedup (ref: kvraft/test_test.go:85-96).
  */
final case class KvOp(
    seq: Long,
    clientId: Long,
    clientSeq: Long,
    op: String, // get | put | append
    key: String,
    value: String)

/** Final per-key state after replay. */
final case class KvState(key: String, value: String, n_applied: Long)

/** One linearizable read: the state a Get observed at its log position. */
final case class KvRead(seq: Long, key: String, observed: String)

/** Compacted state of one key: live value + per-client dedup watermark —
  * the batch analogue of the reference's snapshot (kvraft 3B log
  * compaction: state survives, the log prefix is discarded;
  * kvraft/test_test.go:152, 278). `clientMarks` is O(clients), not
  * O(history), which is exactly why compaction works.
  */
final case class KvSnapshot(
    key: String,
    value: String,
    n_applied: Long,
    clientMarks: Map[Long, Long])

/** Batch replay of the reference's declared KV semantics
  * (ref: models/kv.go:40-54 — Get returns state, Put replaces, Append
  * concatenates, initial state "") with exactly-once duplicate
  * suppression by (clientId, clientSeq) (K4).
  *
  * Scale design — secondary sort, not group materialization:
  * `repartition(col("key"))` hash-partitions by key (same key → same
  * partition), `sortWithinPartitions(key, seq)` gives each partition its
  * keys as contiguous seq-ordered runs, and a single `mapPartitions`
  * linear scan folds each run, streaming results out lazily — no per-key
  * `collect_list`, no driver involvement; memory is the live state plus
  * the exact-once dedup set of the CURRENT key only (the O(clients)
  * watermark alternative is in [[snapshot]]). This is exactly how the
  * engine would replay a 100 TB op log on 1000 executors.
  */
object KvOps {

  /** Deterministic op log derived from the `events` table (TESTDATA.md):
    * signup→Put, purchase/click→Append, view/error→Get; key = one of 26
    * letters from user_id; value = "x<client>.<seq>y" (shape mirrors the
    * reference's append payloads, kvraft/test_test.go:207-209). Every 7th
    * op is also delivered a second time (seq + 10^9, same clientId and
    * clientSeq) to exercise K4 dedup.
    */
  def opLog(s: SparkSession, dir: String): Dataset[KvOp] = {
    import s.implicits._
    val base = graft.core.Tables(s, dir).events
      .select(
        $"event_id".as("seq"),
        $"user_id".as("clientId"),
        $"event_id".as("clientSeq"),
        when($"event_type" === "signup", "put")
          .when($"event_type".isin("purchase", "click"), "append")
          .otherwise("get").as("op"),
        expr("char(97 + user_id % 26)").as("key"))
      .withColumn("value",
        when($"op" === "get", "")
          .otherwise(concat(lit("x"), $"clientId", lit("."), $"seq", lit("y"))))
    val dups = base.filter($"seq" % 7 === 0)
      .withColumn("seq", $"seq" + 1000000000L)
    base.unionAll(dups).as[KvOp]
  }

  /** Partition-local fold over (key, seq)-sorted runs, as a lazy
    * iterator: output rows stream out as the scan advances — nothing is
    * buffered beyond the current key's live state and its dedup set
    * (O(ops of one key) worst case for the exact first-delivery-wins
    * contract; the O(clients) watermark variant lives in [[snapshot]]).
    * Calls `onGet` for every applied Get and `onKeyEnd` when a key's run
    * closes.
    */
  private def foldRuns[T](
      it: Iterator[KvOp],
      onGet: (KvOp, String) => Option[T],
      onKeyEnd: (String, String, Long) => Option[T]): Iterator[T] = new Iterator[T] {
    private var curKey: String = null
    private var state: String = ""
    private var applied = 0L
    private val seen = scala.collection.mutable.HashSet.empty[(Long, Long)]
    private val pending = scala.collection.mutable.Queue.empty[T]
    private var exhausted = false

    private def closeRun(): Unit =
      if (curKey != null) onKeyEnd(curKey, state, applied).foreach(pending.enqueue(_))

    private def advance(): Unit = {
      while (pending.isEmpty && !exhausted) {
        if (!it.hasNext) {
          closeRun()
          exhausted = true
        } else {
          val o = it.next()
          if (o.key != curKey) {
            closeRun()
            curKey = o.key; state = ""; applied = 0L; seen.clear()
          }
          if (seen.add((o.clientId, o.clientSeq))) { // K4: first delivery wins
            o.op match {
              case "get"    => onGet(o, state).foreach(pending.enqueue(_))
              case "put"    => state = o.value; applied += 1
              case "append" => state = state + o.value; applied += 1 // models/kv.go:50-53
            }
          }
        }
      }
    }

    override def hasNext: Boolean = { advance(); pending.nonEmpty }
    override def next(): T = { advance(); pending.dequeue() }
  }

  private def sorted(ops: Dataset[KvOp]): Dataset[KvOp] =
    ops.repartition(col("key")).sortWithinPartitions("key", "seq")

  /** K1–K4: final state of every key (value + number of applied writes). */
  def replay(ops: Dataset[KvOp]): Dataset[KvState] = {
    import ops.sparkSession.implicits._
    sorted(ops).mapPartitions(
      foldRuns(_, (_, _) => None,
        (k, v, n) => Some(KvState(k, v, n))))
  }

  /** Compact a log prefix into per-key snapshots. Dedup watermark
    * semantics assume the reference's clerk behavior: each client issues
    * one op at a time with increasing clientSeq, and re-deliveries
    * repeat an already-issued op (kvraft/client.go:30-31) — so "max
    * clientSeq applied" suffices to recognize any retry.
    */
  def snapshot(ops: Dataset[KvOp]): Dataset[KvSnapshot] = {
    import ops.sparkSession.implicits._
    sorted(ops).mapPartitions { it =>
      val out = scala.collection.mutable.ArrayBuffer.empty[KvSnapshot]
      var curKey: String = null
      var state = ""
      var applied = 0L
      var marks = Map.empty[Long, Long]
      def close(): Unit =
        if (curKey != null) out += KvSnapshot(curKey, state, applied, marks)
      it.foreach { o =>
        if (o.key != curKey) { close(); curKey = o.key; state = ""; applied = 0L; marks = Map.empty }
        if (o.clientSeq > marks.getOrElse(o.clientId, Long.MinValue)) {
          marks += o.clientId -> o.clientSeq
          o.op match {
            case "put"    => state = o.value; applied += 1
            case "append" => state = state + o.value; applied += 1
            case _        => ()
          }
        }
      }
      close()
      out.iterator
    }
  }

  /** Incremental replay: apply a log suffix on top of snapshots.
    * `replayFrom(snapshot(prefix), suffix) == replay(prefix ++ suffix)`
    * for clerk-shaped logs (see [[snapshot]]) — the log prefix never
    * needs to be re-read.
    */
  def replayFrom(snaps: Dataset[KvSnapshot], suffix: Dataset[KvOp]): Dataset[KvState] = {
    import snaps.sparkSession.implicits._
    snaps.groupByKey(_.key).cogroup(suffix.groupByKey(_.key)) { (key, sIt, oIt) =>
      val snap = sIt.toSeq.headOption.getOrElse(KvSnapshot(key, "", 0L, Map.empty))
      var state = snap.value
      var applied = snap.n_applied
      var marks = snap.clientMarks
      oIt.toSeq.sortBy(_.seq).foreach { o =>
        if (o.clientSeq > marks.getOrElse(o.clientId, Long.MinValue)) {
          marks += o.clientId -> o.clientSeq
          o.op match {
            case "put"    => state = o.value; applied += 1
            case "append" => state = state + o.value; applied += 1
            case _        => ()
          }
        }
      }
      Iterator.single(KvState(key, state, applied))
    }
  }

  /** K1: the value each Get observed at its position in the log. */
  def reads(ops: Dataset[KvOp]): Dataset[KvRead] = {
    import ops.sparkSession.implicits._
    sorted(ops).mapPartitions(
      foldRuns(_, (o, st) => Some(KvRead(o.seq, o.key, st)),
        (_, _, _) => None))
  }
}
