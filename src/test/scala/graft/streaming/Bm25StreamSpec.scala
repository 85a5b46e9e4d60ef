package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The streaming lexical server must reproduce the batch
  * tx_bm25_impact rows exactly for the gate query docs, however the
  * query stream splits into micro-batches, and must serve ad-hoc
  * queries whose ids are not corpus docs.
  */
class Bm25StreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming BM25 serving equals the batch impact tier across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val qdocs = graft.core.Tables(spark, dir).documents
      .filter($"doc_id" % 50 === 0)
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(qdocs.size >= 4)

    val served = mutable.Buffer.empty[(Long, Int, Long, Double)]
    val in = MemoryStream[(Long, String)]
    val q = Bm25Stream.serve(in.toDS().toDF("doc_id", "text"), spark, dir) { out =>
      served ++= out.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    }.queryName("bm25_serve").start()
    val cut = qdocs.length / 2
    Seq(qdocs.take(cut), qdocs.drop(cut))
      .foreach { chunk => in.addData(chunk: _*); q.processAllAvailable() }
    q.stop()

    val batch = graft.SparkEntry.queries("tx_bm25_impact")(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(served.toSet == batch)
    assert(served.size == served.toSet.size) // no double-serve across batches
  }

  test("ad-hoc queries (ids outside the corpus) are served from the full index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val text = graft.core.Tables(spark, dir).documents
      .filter($"doc_id" === 0).collect()(0).getAs[String]("text")

    // depth covering the whole corpus, so retrievability is decidable
    val served = mutable.Buffer.empty[(Long, Int, Long, Double)]
    val in = MemoryStream[(Long, String)]
    val q = Bm25Stream.serve(in.toDS().toDF("doc_id", "text"), spark, dir,
      k = 600) { out =>
      served ++= out.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    }.queryName("bm25_adhoc").start()
    in.addData((999999L, text)); q.processAllAvailable()
    q.stop()

    assert(served.nonEmpty && served.forall(_._1 == 999999L))
    // no self-exclusion for an id outside the corpus: doc 0 (whose text
    // IS the query) is retrievable
    assert(served.map(_._3).contains(0L))
    // and the stream serves exactly what the batch core serves
    import spark.implicits._
    val batch = graft.queries.Retrieval.bm25ServeBatch(spark, dir,
        Seq((999999L, text)).toDF("doc_id", "text"), 600)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(served.toSet == batch)
  }
}
