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
}
