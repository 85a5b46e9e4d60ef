package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The production state-store posture: at 100 TB-scale streaming the
  * keyed state (sessions, join buffers, dedup watermarks) outgrows the
  * default in-heap HDFS-backed store — RocksDB keeps it off-heap with
  * spill-to-disk and incremental checkpointing. This spec proves the
  * engine's stateful operators run unchanged on the RocksDB provider
  * (the provider class is recorded per-query in the checkpoint, so the
  * restart resumes on RocksDB too) and that state + timeouts survive a
  * checkpoint restart exactly as on the default store.
  */
class RocksDbStateSpec extends SparkSpec {

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("sessionize on the RocksDB state store survives a checkpoint restart") {
    import java.sql.Timestamp
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", Provider)
    val root = Files.createTempDirectory("graft_rocks").toString
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
    Files.createDirectories(Paths.get(in))

    def t(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    def writeBatch(rows: Seq[(Timestamp, Long)]): Unit =
      rows.toDF("ts", "user_id").coalesce(1).write.mode("append").parquet(in)

    // the conf alone proves nothing (a typo'd provider class would fall
    // back silently): assert RocksDB-only custom metrics appear in the
    // state operator progress of the running query
    var sawRocksDb = false
    def runOnce(): Unit = {
      import scala.jdk.CollectionConverters._
      val src = spark.readStream
        .schema("ts TIMESTAMP, user_id LONG")
        .parquet(in)
      val q = EventStreams.sessionize(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode(OutputMode.Append()).start()
      q.processAllAvailable()
      sawRocksDb |= q.recentProgress.exists(_.stateOperators.exists(
        _.customMetrics.keySet().asScala.exists(_.startsWith("rocksdb"))))
      q.stop()
    }

    try {
      // run 1: user 1's session opens on RocksDB state (no output yet)
      writeBatch(Seq((t(10, 0), 1L), (t(10, 20), 1L)))
      runOnce()
      // run 2: restored RocksDB state + armed event-time timeout close it
      writeBatch(Seq((t(14, 0), 99L)))
      runOnce()
      writeBatch(Seq((t(23, 0), 98L))) // flush user 99's singleton
      runOnce()

      val sessions = spark.read.parquet(out).as[EventStreams.Session]
        .collect().filter(_.user_id == 1L).toSeq
      assert(sessions == Seq(EventStreams.Session(1L, t(10, 0), t(10, 20), 2L)))
      assert(sawRocksDb, "query did not run on the RocksDB state store")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
