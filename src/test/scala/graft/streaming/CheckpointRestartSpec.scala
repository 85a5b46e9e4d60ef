package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming file pipeline with checkpoint/restart: a parquet-source →
  * transform → parquet-sink query stopped and restarted from its
  * checkpoint must process new input exactly once — the recovery
  * contract a production ingest pipeline relies on.
  */
class CheckpointRestartSpec extends SparkSpec {

  test("file source -> file sink resumes from checkpoint exactly-once") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ckpt").toString
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
    Files.createDirectories(Paths.get(in))

    def writeBatch(ids: Range): Unit =
      ids.map(i => (i.toLong, s"v$i")).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(in)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("id LONG, v STRING")
        .parquet(in)
        .withColumn("doubled", $"id" * 2)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode(OutputMode.Append()).start()
      q.processAllAvailable()
      q.stop()
    }

    writeBatch(0 until 100)
    runOnce()
    writeBatch(100 until 150)
    runOnce() // restart from the same checkpoint

    val got = spark.read.parquet(out).select($"id", $"doubled").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == (0L until 150L).map(i => (i, i * 2)).toSeq) // each exactly once
  }

  test("sessionize state and timeouts survive a checkpoint restart") {
    import java.sql.Timestamp
    import spark.implicits._
    val root = Files.createTempDirectory("graft_sess_ckpt").toString
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
    Files.createDirectories(Paths.get(in))

    def t(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    def writeBatch(rows: Seq[(Timestamp, Long)]): Unit =
      rows.toDF("ts", "user_id").coalesce(1).write.mode("append").parquet(in)

    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("ts TIMESTAMP, user_id LONG")
        .parquet(in)
      // PARTITIONED sink: the production layout (sessions land under
      // user_id=N/ directories, downstream reads partition-prune) —
      // restart must keep exactly-once within each partition directory
      val q = EventStreams.sessionize(src)
        .writeStream.format("parquet")
        .partitionBy("user_id")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode(OutputMode.Append()).start()
      q.processAllAvailable()
      q.stop()
    }

    // run 1: user 1's session opens (no output yet — still open)
    writeBatch(Seq((t(10, 0), 1L), (t(10, 20), 1L)))
    runOnce()
    // run 2 (fresh query from the checkpoint): the open session's state
    // AND its armed event-time timeout must be restored — the far-future
    // event advances the watermark past last+gap and closes it
    writeBatch(Seq((t(14, 0), 99L)))
    runOnce()
    writeBatch(Seq((t(23, 0), 98L))) // flush user 99's singleton too
    runOnce()

    // partition directories exist on disk (hive-style layout)
    assert(Files.isDirectory(Paths.get(s"$out/user_id=1")))
    val sessions = spark.read.parquet(out).as[EventStreams.Session]
      .collect().filter(_.user_id == 1L).toSeq
    assert(sessions == Seq(EventStreams.Session(1L, t(10, 0), t(10, 20), 2L)))
  }
}
