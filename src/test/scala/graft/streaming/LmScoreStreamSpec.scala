package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The streaming LM scorer must reproduce the batch tx_unigram_logprob
  * rows exactly, however the ingest splits into micro-batches — the
  * per-row sorted-term fold is the same IEEE sum the batch side's
  * groupBy+sorted-fold computes.
  */
class LmScoreStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming LM scores equal the batch query across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Tables(spark, dir).documents
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val in = MemoryStream[(Long, String)]
    val q = LmScoreStream.scores(in.toDS().toDF("doc_id", "text"), spark, dir)
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode("append").start()
    val cut1 = docs.length / 5
    val cut2 = docs.length / 2
    Seq(docs.take(cut1), docs.slice(cut1, cut2), docs.drop(cut2))
      .foreach { chunk => in.addData(chunk: _*); q.processAllAvailable() }
    q.stop()

    val streaming = spark.table("lm_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.SparkEntry.queries("tx_unigram_logprob")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streaming == batch)
    assert(streaming.size == docs.size) // every doc scored, none dropped
  }

  test("streaming bigram scores equal the batch query across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Tables(spark, dir).documents
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val in = MemoryStream[(Long, String)]
    val q = LmScoreStream.bigramScores(in.toDS().toDF("doc_id", "text"), spark, dir)
      .writeStream.format("memory").queryName("bigram_stream")
      .outputMode("append").start()
    val cut = docs.length / 3
    Seq(docs.take(cut), docs.drop(cut))
      .foreach { chunk => in.addData(chunk: _*); q.processAllAvailable() }
    q.stop()

    val streaming = spark.table("bigram_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.SparkEntry.queries("tx_bigram_logprob")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    assert(streaming == batch)
  }

  test("streaming BPE token counts equal the batch query across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Tables(spark, dir).documents
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val in = MemoryStream[(Long, String)]
    val q = LmScoreStream.bpeTokenCounts(in.toDS().toDF("doc_id", "text"), spark, dir)
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append").start()
    val cut = docs.length / 4
    Seq(docs.take(cut), docs.drop(cut))
      .foreach { chunk => in.addData(chunk: _*); q.processAllAvailable() }
    q.stop()

    val streaming = spark.table("bpe_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.SparkEntry.queries("tx_bpe_token_count")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streaming == batch)
  }
}
