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
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    serveLatestWith(queries, root)((s, g, batch) =>
      Retrieval.bm25ServeGenBatch(s, g, batch, k))(sink)

  /** EXACT-RESCORE serving mode: every micro-batch goes through the
    * wand verdict + candidate-restricted rescore against the stored
    * corpus at `dir` — every answer is exact (no certificate column;
    * nothing approximate to flag), for consumers below the U == 0 knee.
    * Costs the rescore join per batch and requires postings access;
    * the plain [[serveLatest]] stays the bounded no-rescore tier.
    */
  def serveLatestRescored(queries: DataFrame, root: String, dir: String,
      k: Int = Retrieval.BmK)(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    serveLatestWith(queries, root)((s, g, batch) =>
      Retrieval.bm25ServeGenBatchRescored(s, g, dir, batch, k))(sink)

  /** TWO-PASS (RM3) serving mode: rank, mine expansion terms from the
    * feedback docs' stored postings at `dir`, rank again with the
    * expanded probe — both passes on the committed generation's index,
    * within one micro-batch (the batch tx_bm25_rm3 flow as a serving
    * path).
    */
  def serveLatestRm3(queries: DataFrame, root: String, dir: String,
      k: Int = Retrieval.BmK)(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    serveLatestWith(queries, root)((s, g, batch) =>
      Retrieval.bm25ServeGenBatchRm3(s, g, dir, batch, k))(sink)

  /** QUERY-LIKELIHOOD serving from the same committed generation — the
    * second lexical scorer's no-rescore tier: per micro-batch, per-query
    * top-k over the generation's cf-ordered truncated QL lists plus the
    * exact stored-length Dirichlet prior, every answer carrying the
    * U == 0 exactness certificate. Same pointer protocol as
    * [[serveLatest]] (one `_latest` per lexical generation root serves
    * BOTH scorers — [[graft.queries.Retrieval.writeLexicalGeneration]]
    * commits the BM25 pair and the QL slice in one generation).
    */
  def serveLatestQl(queries: DataFrame, root: String,
      k: Int = Retrieval.BmK)(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    qlServeLatestWith(queries, root)((s, g, batch) =>
      Retrieval.qlServeGenBatch(s, g, batch, k))(sink)

  /** PRIOR-BOUND CERTIFIED QL serving mode: every micro-batch runs the
    * QL wand verdict (U == 0 OR θ beats U + the unseen-candidate prior
    * bound from the generation's stored m_min) + candidate-restricted
    * exact rescore against the stored corpus at `dir` — every answer
    * exact, certification possible under ACTIVE truncation (the
    * capability BM25's U-only rescored mode lacks). The QL twin of
    * [[serveLatestRescored]].
    */
  def serveLatestQlWand(queries: DataFrame, root: String, dir: String,
      k: Int = Retrieval.BmK)(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    qlServeLatestWith(queries, root)((s, g, batch) =>
      Retrieval.qlServeGenBatchWand(s, g, dir, batch, k))(sink)

  /** The shared generation-resolving micro-batch loop ([[GenServe]])
    * bound to the `{index, bounds}` pair. */
  private def serveLatestWith(queries: DataFrame, root: String)(
      score: (SparkSession, Retrieval.LexicalGeneration, DataFrame) => DataFrame)(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    GenServe.latestLoop[Retrieval.LexicalGeneration](
      queries, root, "lexical", _.gen)(Retrieval.loadLexicalGeneration)(score)(sink)

  /** The same loop for the generation's QL slice — same pointer
    * contract, QL artifacts (+ the once-per-load m_min scalar). */
  private def qlServeLatestWith(queries: DataFrame, root: String)(
      score: (SparkSession, Retrieval.QlGeneration, DataFrame) => DataFrame)(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    GenServe.latestLoop[Retrieval.QlGeneration](
      queries, root, "lexical", _.gen)(Retrieval.loadQlGeneration)(score)(sink)
}
