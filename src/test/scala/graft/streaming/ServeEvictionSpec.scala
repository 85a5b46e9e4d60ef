package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.queries.Similarity

/** Bounded serving state: with `stateRetention` set, [[AnnStream.pqServe]]
  * evicts a served probe's dedup state after the retention window — the
  * state store tracks the RECENT probe set, not lifetime queries. Both
  * halves of the watermarked-dropDuplicates contract are pinned here:
  *  - state rows drop to ZERO once retention elapses (the store is
  *    bounded — the unbounded-growth failure mode is gone);
  *  - a re-delivery arriving AFTER eviction is served AGAIN (at-least-
  *    once output, never loss — the trade the retention window buys).
  * `processAllAvailable` cannot be used under ProcessingTimeTimeout
  * (the engine never quiesces — see the [[AnnStream.ServedStateRetention]]
  * scaladoc), so the spec polls the sink and the query's state-operator
  * metrics under a processing-time trigger, the same way a production
  * serving tier runs.
  */
class ServeEvictionSpec extends SparkSpec {

  import spark.implicits._

  test("probe state evicts after retention; post-eviction re-delivery re-serves") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    implicit val sqlCtx = spark.sqlContext

    val centroids = Similarity.trainedCentroidArrays(spark, dir)
    val codebook = Similarity.pqCodebookArrays(spark, dir)
    val (nprobe, shortlist) = Similarity.pqServingDefaults
    val index = Similarity.pqServingIndex(spark, dir).as[AnnStream.IndexRow]

    val qs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter($"vec_id" < 10)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val events = qs.zipWithIndex.map { case ((id, emb), i) =>
      AnnStream.QueryEvent(src = 0, seq = i.toLong, probe = id, embedding = emb)
    }

    val in = MemoryStream[AnnStream.QueryEvent]
    val q = AnnStream.pqServe(in.toDS(), index, centroids, codebook, nprobe,
        shortlist, stateRetention = Some("1 second"))
      .writeStream.format("memory").queryName("ann_pq_serve_evict")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      def sinkCount(): Long = spark.table("ann_pq_serve_evict").count()
      def servedProbes(): Long =
        spark.table("ann_pq_serve_evict").select($"probe").distinct().count()
      def stateRows(): Long = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
      def await(cond: () => Boolean, what: String, ms: Long = 120000L): Unit = {
        val deadline = System.nanoTime + ms * 1000000L
        while (!cond()) {
          assert(System.nanoTime < deadline, s"timed out waiting for: $what")
          Thread.sleep(200)
        }
      }

      in.addData(events.toIndexedSeq)
      await(() => servedProbes() == events.length.toLong, "first round served")
      val afterFirst = sinkCount()

      // retention elapses → the state store empties (bounded state)
      await(() => stateRows() == 0L, "state rows evicted to zero")
      assert(sinkCount() == afterFirst, "eviction itself emitted rows")

      // re-delivery AFTER eviction: the probe's high-water is gone, so
      // the query is served again — duplicate output, never loss
      in.addData(events.take(3).toIndexedSeq)
      await(() => sinkCount() > afterFirst, "post-eviction re-delivery re-served")
    } finally q.stop()
  }
}
