package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The streaming NB classifier must reproduce the batch tx_nb_score
  * rows exactly, however the ingest splits into micro-batches: the
  * shipped scaled-long model replays the batch side's DECIMAL sum.
  */
class NbScoreStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming NB scores equal the batch query across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Tables(spark, dir).documents
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val in = MemoryStream[(Long, String)]
    val q = NbScoreStream.scores(in.toDS().toDF("doc_id", "text"), spark, dir)
      .writeStream.format("memory").queryName("nb_stream")
      .outputMode("append").start()
    val cut1 = docs.length / 4
    val cut2 = docs.length / 2
    Seq(docs.take(cut1), docs.slice(cut1, cut2), docs.drop(cut2))
      .foreach { chunk => in.addData(chunk: _*); q.processAllAvailable() }
    q.stop()

    val streaming = spark.table("nb_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // the stream scores EVERY arriving doc (train docs included); the
    // batch query emits only the held-out split — parity on that subset
    val heldOut = streaming.filter(_._1 % 3 == 0).toSet
    val batch = graft.SparkEntry.queries("tx_nb_score")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(heldOut == batch)
    // train-split docs flow through the same gate (scored, not dropped)
    assert(streaming.exists(_._1 % 3 != 0))
  }
}
