package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.queries.Dedup

/** The streaming incremental-dedup twin must reproduce the batch match
  * set exactly, however the ingest splits into micro-batches — and the
  * per-row band formulation it rides must stay value-identical to the
  * staged groupBy band index.
  */
class DedupStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("array-route band structs equal the staged band index") {
    import spark.implicits._
    val staged = Dedup.minhashBandIndex(spark, dir)
      .select($"doc_id", $"band", $"key")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val arrayRoute = Dedup.withBandStructs(Dedup.keptSets(spark, dir), "shs")
      .select($"doc_id",
        org.apache.spark.sql.functions.explode($"_bands").as("bk"))
      .select($"doc_id", $"bk.band", $"bk.key")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(arrayRoute == staged)
    assert(staged.nonEmpty)
  }

  test("streaming incremental dedup equals the batch match set across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val newDocs = graft.core.Tables(spark, dir).documents
      .filter($"doc_id" % 5 === 0)
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val in = MemoryStream[(Long, String)]
    val q = DedupStream.matches(in.toDS().toDF("doc_id", "text"), spark, dir)
      .writeStream.format("memory").queryName("incr_stream")
      .outputMode("append").start()
    // three uneven micro-batches: the match set must not depend on how
    // the ingest chunks
    val cut1 = newDocs.length / 4
    val cut2 = newDocs.length / 2
    Seq(newDocs.take(cut1), newDocs.slice(cut1, cut2), newDocs.drop(cut2))
      .foreach { chunk => in.addData(chunk: _*); q.processAllAvailable() }
    q.stop()

    val streaming = spark.table("incr_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Dedup.incrementalMatches(spark, dir)
      .select($"ni", $"oi",
        org.apache.spark.sql.functions.round($"jac", 6).as("jac"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streaming == batch)
    assert(streaming.nonEmpty)
    // and the shipped decision query is exactly the argmax of this set
    val decisions = Dedup.queries("dedup_incremental")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(decisions.map(_._1) == streaming.map(_._1))
    decisions.foreach { case (ni, oi, jac) => assert(streaming.contains((ni, oi, jac))) }
  }

  test("streaming embedding ingest dedup equals the batch match set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val newVecs = graft.core.Tables(spark, dir).embeddings
      .filter($"vec_id" % 5 === 0)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toSeq

    val in = MemoryStream[(Long, Array[Float])]
    val q = DedupStream.embMatches(in.toDS(), spark, dir)
      .writeStream.format("memory").queryName("emb_incr_stream")
      .outputMode("append").start()
    val cut = newVecs.length / 3
    Seq(newVecs.take(cut), newVecs.slice(cut, 2 * cut), newVecs.drop(2 * cut))
      .foreach { chunk => in.addData(chunk: _*); q.processAllAvailable() }
    q.stop()

    val streaming = spark.table("emb_incr_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.queries.Similarity.embIncrementalMatches(spark, dir)
      .select($"ni", $"oi",
        org.apache.spark.sql.functions.round($"cos", 6).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streaming == batch)
    assert(streaming.nonEmpty)
    val decisions = graft.SparkEntry.queries("dedup_emb_incremental")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(decisions.map(_._1) == streaming.map(_._1))
    decisions.foreach { case (ni, oi, cos) => assert(streaming.contains((ni, oi, cos))) }
  }
}
