package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.Row

import graft.queries.Retrieval

/** Streaming lexical serving: a continuous stream of query docs
  * (doc_id, text) probes the STATIC staged BM25 impact index — the
  * always-on twin of `tx_bm25_impact`, closing the lexical side's
  * build-offline/serve-online loop next to the dense tier's
  * `AnnStream.pqServePruned`.
  *
  * foreachBatch form (the pruned-serving convention): per-query top-k
  * needs a per-batch-complete aggregation, which append mode cannot
  * express — each micro-batch runs the batch scorer against the staged
  * index and hands the finished ranking to the sink. The index is
  * session-memoized, so steady-state per-batch work is the batch's
  * (queries × terms × ≤P) probe and nothing corpus-sized.
  *
  * Parity: fed the gate query docs, each batch's rows are EXACTLY the
  * tx_bm25_impact rows for those qids (same frames, same folds —
  * Bm25StreamSpec pins it across micro-batch splits). Ad-hoc queries
  * (ids absent from the corpus) are served from the full index — the
  * self-exclusion simply never triggers.
  */
object Bm25Stream {

  /** Serve each arriving micro-batch of (doc_id, text) query docs:
    * top-`k` (qid, rank, doc_id, bm25) per query, delivered to `sink`.
    * Start with `.queryName(...).start()` like any foreachBatch query.
    */
  def serve(queries: DataFrame, s: SparkSession, dir: String,
      k: Int = Retrieval.BmK)(
      sink: DataFrame => Unit): DataStreamWriter[Row] = {
    val fn: (DataFrame, Long) => Unit = { (batch, _) =>
      if (!batch.isEmpty) sink(Retrieval.bm25ServeBatch(s, dir, batch, k))
    }
    queries.writeStream.foreachBatch(fn).outputMode(OutputMode.Update())
  }

  /** The serving form bound to a GENERATION ROOT instead of a session
    * corpus: each micro-batch resolves the `_latest` pointer
    * ([[graft.queries.Retrieval.writeLexicalGeneration]]'s commit
    * point) and reloads the `{index, bounds}` pair only when the
    * generation number changed — a rebuilt impact index cuts over LIVE
    * between micro-batches with no query restart, rollback is the same
    * mechanism pointed backwards (the `AnnStream.pqServeLatest`
    * contract on the lexical tier). Each answer row carries the
    * per-query exactness certificate (safe = 1 iff no probed list was
    * truncated — see [[graft.queries.Retrieval.bm25ServeGenBatch]]).
    */
  def serveLatest(queries: DataFrame, root: String,
      k: Int = Retrieval.BmK)(
      sink: DataFrame => Unit): DataStreamWriter[Row] = {
    var cached: Option[Retrieval.LexicalGeneration] = None
    val fn: (DataFrame, Long) => Unit = { (batch, _) =>
      if (!batch.isEmpty) {
        val s = batch.sparkSession
        // a vanished pointer is an ERROR, not license to keep serving a
        // stale cached generation with exactness certificates — same
        // contract as the never-loaded case
        val latest = graft.core.Generations.latest(root).getOrElse(
          sys.error(s"$root: no committed lexical serving generation"))
        if (!cached.map(_.gen).contains(latest))
          cached = Some(Retrieval.loadLexicalGeneration(s, root))
        sink(Retrieval.bm25ServeGenBatch(s, cached.get, batch, k))
      }
    }
    queries.writeStream.foreachBatch(fn).outputMode(OutputMode.Update())
  }
}
