package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The streaming hybrid server must reproduce the batch
  * ann_hybrid_serving rows exactly for the gate query docs, however
  * the query stream splits into micro-batches — both arms are the
  * parity-pinned serving cores (lexical impact index + IVF-PQ pruned
  * pass), each resolved from its own committed generation.
  */
class HybridStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming hybrid fusion equals the batch all-staged fusion across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("hybgen").toString
    try {
      val (lexRoot, annRoot) = (s"$tmp/lex", s"$tmp/ann")
      assert(graft.queries.Retrieval.writeLexicalGeneration(spark, dir, lexRoot) == 1L)
      assert(graft.queries.Similarity.writeServingGeneration(spark, dir, annRoot) == 1L)
      val (nprobe, shortlist) = graft.queries.Similarity.pqServingDefaults
      // the embedded gate queries: every %50-stride vector with its doc
      val qs = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter($"vec_id" % 50 === 0)
        .join(graft.core.Tables(spark, dir).documents
          .select($"doc_id", $"text"), $"vec_id" === $"doc_id")
        .select($"doc_id", $"text", $"embedding")
        .as[(Long, String, Array[Float])].collect()
        .map { case (id, t, e) => HybridStream.HybridQuery(id, t, e) }.toSeq
      assert(qs.size >= 2)

      val served = mutable.Buffer.empty[(Long, Int, Long, Double)]
      val in = MemoryStream[HybridStream.HybridQuery]
      val q = HybridStream.serveLatest(
        in.toDS(), lexRoot, annRoot, nprobe, shortlist) { out =>
        served ++= out.collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      }.queryName("hybrid_serve").start()
      val cut = qs.length / 2
      Seq(qs.take(cut), qs.drop(cut))
        .foreach { chunk => in.addData(chunk: _*); q.processAllAvailable() }
      q.stop()

      val batch = graft.SparkEntry.queries("ann_hybrid_serving")(spark, dir)
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(served.toSet == batch,
        s"streamed fusion must equal ann_hybrid_serving: " +
          s"${served.toSet.diff(batch)} vs ${batch.diff(served.toSet)}")
      assert(served.size == served.toSet.size) // no double-serve
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
