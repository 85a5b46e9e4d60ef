package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Stream-stream interval join and event-time-timeout sessionization,
  * driven through MemoryStream micro-batches.
  */
class EventStreamsSpec extends SparkSpec {

  import spark.implicits._

  private def t(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("stream-stream join attributes purchases to clicks within the interval") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val purchases = MemoryStream[(Timestamp, Long)]
    val joined = EventStreams.clickPurchaseJoin(
      clicks.toDS().toDF("click_ts", "user_id"),
      purchases.toDS().toDF("purchase_ts", "user_id"),
      withinSeconds = 3600L)
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()

    // user 1: click 10:00 → purchases at 10:30 (in window) and 11:30 (out)
    // user 2: purchase with NO prior click → never emitted
    clicks.addData((t(10, 0), 1L))
    purchases.addData((t(10, 30), 1L), (t(11, 30), 1L), (t(10, 15), 2L))
    q.processAllAvailable()
    // second click for user 1 catches the 11:30 purchase
    clicks.addData((t(11, 0), 1L))
    q.processAllAvailable()

    val rows = spark.table("attrib")
      .select($"user_id", $"click_ts", $"purchase_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    q.stop()
    assert(rows == Set(
      (1L, t(10, 0), t(10, 30)),
      (1L, t(11, 0), t(11, 30))))
  }

  test("dropDuplicatesWithinWatermark collapses at-least-once delivery to exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val q = EventStreams.dedupWithinWatermark(in.toDS().toDF("ts", "event_id"))
      .writeStream.format("memory").queryName("dedup_ww")
      .outputMode(OutputMode.Append()).start()

    // in-batch duplicate of event 1, plus a distinct event 2
    in.addData((t(10, 0), 1L), (t(10, 0), 1L), (t(10, 5), 2L))
    q.processAllAvailable()
    // cross-batch retry of event 1 with a JITTERED timestamp — still
    // within the watermark delay of the original, so it must be dropped
    // (a (id, ts)-keyed dropDuplicates would emit it again)
    in.addData((t(10, 1), 1L))
    q.processAllAvailable()

    val rows = spark.table("dedup_ww")
      .select($"event_id").as[Long].collect().toSeq.sorted
    q.stop()
    assert(rows == Seq(1L, 2L))
  }

  test("sessions closed by an in-batch gap emit immediately") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val q = EventStreams.sessionize(in.toDS().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("sess_inline")
      .outputMode(OutputMode.Append()).start()

    // user 3 sends two bursts > 30 min apart in ONE batch: the first
    // session closes inline without waiting for any watermark
    in.addData((t(9, 0), 3L), (t(9, 10), 3L), (t(11, 0), 3L))
    q.processAllAvailable()

    val rows = spark.table("sess_inline").as[EventStreams.Session].collect()
    q.stop()
    assert(rows.toSeq == Seq(EventStreams.Session(3L, t(9, 0), t(9, 10), 2L)))
  }

  test("quiet users time out via the event-time watermark and emit their session") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val q = EventStreams.sessionize(in.toDS().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("sess_timeout")
      .outputMode(OutputMode.Append()).start()

    in.addData((t(10, 0), 1L), (t(10, 20), 1L), (t(10, 5), 2L))
    q.processAllAvailable()
    assert(spark.table("sess_timeout").isEmpty) // both sessions still open

    // advance event time: watermark = 14:00 - 1h = 13:00, past both
    // users' last+30min → both sessions fire their timeout
    in.addData((t(14, 0), 99L))
    q.processAllAvailable()

    val rows = spark.table("sess_timeout").as[EventStreams.Session]
      .collect().sortBy(_.user_id)
    q.stop()
    assert(rows.toSeq == Seq(
      EventStreams.Session(1L, t(10, 0), t(10, 20), 2L),
      EventStreams.Session(2L, t(10, 5), t(10, 5), 1L)))
  }

  test("dropDuplicatesWithinWatermark dedups re-deliveries with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    // Spark's native streaming dedup: state for a key is retained only
    // within the watermark window — the bounded-state alternative to
    // KvStream's per-client high-water marks when ops carry event time.
    val in = MemoryStream[(Timestamp, Long, String)]
    val deduped = in.toDS().toDF("ts", "event_id", "payload")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_wm")
      .outputMode(OutputMode.Append()).start()

    in.addData((t(10, 0), 1L, "a"), (t(10, 1), 1L, "a-dup"), (t(10, 2), 2L, "b"))
    q.processAllAvailable()
    in.addData((t(10, 30), 1L, "a-redelivery")) // still inside the window
    q.processAllAvailable()
    in.addData((t(14, 0), 3L, "c")) // advances watermark, ages out state
    q.processAllAvailable()

    val ids = spark.table("dedup_wm").select($"event_id").as[Long]
      .collect().toSeq.sorted
    q.stop()
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("streaming sessionization agrees with batch gap-splitting on a replayed log") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic multi-user log, replayed through the streaming
    // sessionizer in several micro-batches, with a final far-future
    // sentinel to flush every open session
    val log = Seq(
      (t(8, 0), 1L), (t(8, 10), 1L), (t(9, 30), 1L), // user 1: 2 sessions
      (t(8, 5), 2L), (t(8, 20), 2L), (t(8, 40), 2L), // user 2: 1 session
      (t(9, 0), 3L)) // user 3: singleton
    val in = MemoryStream[(Timestamp, Long)]
    val q = EventStreams.sessionize(in.toDS().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode(OutputMode.Append()).start()
    // replay in event-time order: an out-of-order replay would advance
    // the watermark past older users' events and (correctly) drop them
    // as late data — not what a parity test wants to measure
    log.sortBy(_._1.getTime).grouped(3)
      .foreach { batch => in.addData(batch); q.processAllAvailable() }
    in.addData((t(23, 0), 99L)) // flush
    q.processAllAvailable()

    val streamed = spark.table("sess_parity").as[EventStreams.Session].collect()
      .filter(_.user_id != 99L).map(s => (s.user_id, s.session_start, s.session_end, s.n_events))
      .toSet
    q.stop()
    // batch oracle: sort per user, split on gap > 30 min
    val expected = log.groupBy(_._2).flatMap { case (uid, evs) =>
      val ts = evs.map(_._1.getTime).sorted
      val sessions = ts.foldLeft(List.empty[List[Long]]) {
        case (Nil, e) => List(List(e))
        case (cur :: done, e) if e - cur.head > 30 * 60000L => List(e) :: cur :: done
        case (cur :: done, e) => (e :: cur) :: done
      }
      sessions.map(s => (uid, new Timestamp(s.min), new Timestamp(s.max), s.size.toLong))
    }.toSet
    assert(streamed == expected)
  }
}
