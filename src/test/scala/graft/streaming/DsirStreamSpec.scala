package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The streaming DSIR scorer must reproduce the batch tx_dsir_weights
  * rows exactly, however the ingest splits into micro-batches — the
  * per-row sorted-term fold replays the batch side's IEEE sum and the
  * shipped ratio table is the same artifact the batch estimator joins.
  */
class DsirStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming DSIR weights equal the batch query across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Tables(spark, dir).documents
      .select($"doc_id", $"lang", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

    val in = MemoryStream[(Long, String, String)]
    val q = DsirStream.weights(
        in.toDS().toDF("doc_id", "lang", "text"), spark, dir)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    val cut1 = docs.length / 5
    val cut2 = docs.length / 2
    Seq(docs.take(cut1), docs.slice(cut1, cut2), docs.drop(cut2))
      .foreach { chunk => in.addData(chunk: _*); q.processAllAvailable() }
    q.stop()

    val streaming = spark.table("dsir_stream")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = graft.SparkEntry.queries("tx_dsir_weights")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streaming == batch)
    assert(streaming.size == docs.size) // every doc scored, none dropped
  }
}
