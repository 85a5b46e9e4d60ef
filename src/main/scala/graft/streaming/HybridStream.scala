package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.queries.{Retrieval, Similarity}

/** Streaming twin of `ann_hybrid_serving`: a continuous stream of
  * hybrid queries — each a document WITH its embedding — is served by
  * RRF-fusing the two committed serving tiers per micro-batch:
  *
  *  - the SPARSE arm probes the lexical generation's impact-truncated
  *    index (`Bm25Stream.serveLatest`'s core at the fusion depth),
  *  - the DENSE arm runs the IVF-PQ pruned serving pass against the
  *    vector generation's cell-partitioned index
  *    (`AnnStream.pqServeLatest`'s core — literal partition filters
  *    from the batch's probed cells),
  *
  * both resolved from their `_latest` pointers per micro-batch, so a
  * rebuilt index on EITHER side cuts over live between batches with no
  * query restart — the two tiers' generation lifecycles stay
  * independent, exactly as a production deployment rebuilds its sparse
  * and dense indexes on different cadences.
  *
  * Parity: fed the gate query docs with their corpus embeddings, each
  * batch's rows are EXACTLY the batch `ann_hybrid_serving` rows for
  * those qids (both arms are the parity-pinned serving cores and the
  * fusion arithmetic is shared code — HybridStreamSpec pins it across
  * micro-batch splits; each side's live-flip behavior is pinned by its
  * own tier's spec, and the pointer-resolution loop here is the same
  * code shape those specs exercise).
  *
  * The query batch is the request side — bounded by construction — so
  * collecting it per micro-batch (the `pqServePruned` convention) is
  * what lets the dense plan carry literal cell filters. Re-delivery
  * dedup is the caller's concern (compose with a watermarked
  * dropDuplicates upstream, or the `AnnStream.dedupedQueries` device);
  * this operator answers every query it is handed.
  */
object HybridStream {

  /** One arriving hybrid query: a document and its embedding. */
  final case class HybridQuery(doc_id: Long, text: String, embedding: Array[Float])

  /** Serve each arriving micro-batch through BOTH committed generations
    * (`lexRoot` for the sparse arm, `annRoot` for the dense arm) at the
    * given PQ serving knobs; fused top-k (qid, rank, doc_id, rrf) rows
    * go to `sink`. Start with `.queryName(...).start()`.
    */
  def serveLatest(queries: Dataset[HybridQuery], lexRoot: String, annRoot: String,
      nprobe: Int, shortlist: Int,
      fuseDepth: Int = Retrieval.FuseDepth)(
      sink: DataFrame => Unit): DataStreamWriter[HybridQuery] = {
    var lexCached: Option[Retrieval.LexicalGeneration] = None
    var annCached: Option[Similarity.ServingGeneration] = None
    var annMap: Map[Long, Array[Double]] = Map.empty
    val fn: (Dataset[HybridQuery], Long) => Unit = { (batch, _) =>
      val s = batch.sparkSession
      val qs = batch.collect()
      if (qs.nonEmpty) {
        // a vanished pointer on either side is an ERROR, not license to
        // keep serving a stale generation — the serveLatest contract
        val lexLatest = graft.core.Generations.latest(lexRoot).getOrElse(
          sys.error(s"$lexRoot: no committed lexical serving generation"))
        if (!lexCached.map(_.gen).contains(lexLatest))
          lexCached = Some(Retrieval.loadLexicalGeneration(s, lexRoot))
        val annLatest = Similarity.latestServingGeneration(annRoot).getOrElse(
          sys.error(s"$annRoot: no committed serving generation"))
        if (!annCached.map(_.gen).contains(annLatest)) {
          annCached = Some(Similarity.loadServingGeneration(s, annRoot))
          annMap = annCached.get.centroids.toMap
        }
        import s.implicits._
        val brank = Retrieval.bm25ServeGenBatch(s, lexCached.get,
            qs.map(q => (q.doc_id, q.text)).toSeq.toDF("doc_id", "text"),
            fuseDepth, certificate = false)
          .select(col("qid"), col("doc_id"), col("rank").as("rb"))
        val g = annCached.get
        val drank = AnnStream.servePrunedBatch(s,
            qs.map(q => AnnStream.QueryEvent(0L, q.doc_id, q.doc_id, q.embedding)),
            g.indexPath, g.centroids, annMap, g.codebook,
            nprobe, shortlist, fuseDepth)
          .toDF()
          .select(col("probe").as("qid"), col("neighbor").as("doc_id"),
            col("rank").as("rd"))
        sink(Retrieval.hybridFuseRanks(s, brank, drank))
      }
    }
    queries.writeStream.foreachBatch(fn).outputMode(OutputMode.Update())
  }
}
