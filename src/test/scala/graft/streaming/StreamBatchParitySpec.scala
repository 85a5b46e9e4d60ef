package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.OutputMode

/** File-source streaming over the real test table: the streaming hourly
  * aggregation (complete mode, no late data) must converge to exactly
  * the batch answer — the replayability contract of the Structured
  * Streaming formulation.
  */
class StreamBatchParitySpec extends SparkSpec {

  test("streaming hourly windows over events.parquet equal the batch aggregation") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batchEvents = graft.core.Tables(spark, dir).events
    val schema = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(dir).schema

    val streamEvents = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(graft.core.Tables.normalizeEventTs)

    val q = EventWindows.hourly(streamEvents, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("parity_hourly")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable()
    q.stop()

    val streaming = spark.table("parity_hourly")
      .select($"hour", $"event_type", $"n", $"total_value")
      .collect().map(_.toSeq).toSet
    // batch path: same aggregation expressed without watermark
    val batchDirect = batchEvents
      .groupBy(org.apache.spark.sql.functions.window($"ts", "1 hour"), $"event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"value").as("total_value"))
      .select($"window.start".as("hour"), $"event_type", $"n", $"total_value")
      .collect().map(_.toSeq).toSet
    assert(streaming == batchDirect)
    assert(streaming.nonEmpty)
  }

  test("streaming twin reproduces the q_events_hourly ORACLE query exactly") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(dir).schema

    val streamEvents = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(graft.core.Tables.normalizeEventTs)

    val q = EventWindows.hourlyOracleTwin(streamEvents, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("parity_oracle_hourly")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable()
    val dropped = EventWindows.droppedByWatermark(q)
    q.stop()

    val streaming = spark.table("parity_oracle_hourly")
      .select($"hour", $"event_type", $"n", $"total_value")
      .collect().map(_.toSeq).toSet
    // the gate query itself is the oracle: same hour bucket, same
    // exact-DECIMAL sum — results must agree bit-for-bit
    val batchOracle = graft.SparkEntry.queries("q_events_hourly")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streaming == batchOracle)
    assert(streaming.nonEmpty)
    assert(dropped == 0L) // a full in-order replay loses nothing
  }

  test("streaming interval join over events.parquet equals the q_interval_join gate query") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count, lit, max, min, unix_micros}
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(dir).schema
    def stream(eventType: String) = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)

      .transform(graft.core.Tables.normalizeEventTs)
      .filter($"event_type" === eventType)
    val errors = stream("error")
      .select($"event_id".as("err_id"), $"ts".as("err_ts"), $"user_id")
    val clicks = stream("click").select($"ts".as("click_ts"), $"user_id")

    val q = EventStreams.errorClickLookback(errors, clicks)
      .writeStream.format("memory").queryName("parity_ivj")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()

    // roll the emitted pairs up to the gate query's contract
    val streaming = spark.table("parity_ivj")
      .groupBy($"err_id")
      .agg(count(lit(1)).as("n_clicks"),
        min(unix_micros($"click_ts")).as("first_click_us"),
        max(unix_micros($"click_ts")).as("last_click_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batch = graft.SparkEntry.queries("q_interval_join")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streaming == batch)
    assert(streaming.nonEmpty)
  }

  test("the oracle twin's totals are invariant to how input splits into micro-batches") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // values chosen so a DOUBLE running sum is order-sensitive
    // (0.01 is not representable in binary; 1e12 swallows low bits) —
    // the exact-DECIMAL state makes the result split-independent
    def t(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val rows = (0 until 60).map { i =>
      (t(i), i.toLong, "click",
        if (i == 0) 123456789012.34 else 0.01)
    }

    def run(name: String, batches: Seq[Seq[(Timestamp, Long, String, Double)]]): Double = {
      val in = MemoryStream[(Timestamp, Long, String, Double)]
      val q = EventWindows.hourlyOracleTwin(
        in.toDS().toDF("ts", "user_id", "event_type", "value"))
        .writeStream.format("memory").queryName(name)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete()).start()
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val v = spark.table(name).select($"total_value").as[Double].collect().head
      q.stop()
      v
    }

    val oneShot = run("twin_one", Seq(rows))
    val split = run("twin_split", Seq(rows.take(7), rows.slice(7, 31), rows.drop(31)))
    assert(oneShot == split, s"split-dependent total: $oneShot vs $split")
    // the exact decimal total is 123456789012.93; both runs must land on
    // the double nearest that value (the literal below)
    assert(oneShot == 123456789012.93)
  }
}
