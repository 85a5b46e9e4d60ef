package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.queries.Positional

/** Streaming phrase serving: a continuous stream of query docs
  * (doc_id, text — each contributing its opening 3-token phrase)
  * probes the STATIC positional postings — the positional tier's
  * always-on twin, completing the build-offline/serve-online loop the
  * lexical ([[Bm25Stream]]) and vector ([[AnnStream]]) tiers already
  * run.
  *
  * foreachBatch form (the family convention): per-query top-k needs a
  * per-batch-complete aggregation, which append mode cannot express —
  * each micro-batch runs the batch phrase core (anchored rarest-term
  * candidates + exact-position verification) and hands the finished
  * ranking to the sink. Steady-state per-batch work is the batch's
  * anchor-postings probe, never the corpus.
  *
  * Parity: fed the gate query docs, each batch's rows are EXACTLY the
  * tx_phrase_search rows for those qids (PositionalStreamSpec pins it
  * across micro-batch splits).
  */
object PositionalStream {

  /** Serve each arriving micro-batch of (doc_id, text) query docs
    * against the session corpus at `dir`. */
  def serve(queries: DataFrame, s: SparkSession, dir: String, k: Int = 10)(
      sink: DataFrame => Unit): DataStreamWriter[Row] = {
    val fn: (DataFrame, Long) => Unit = { (batch, _) =>
      if (!batch.isEmpty) sink(Positional.phraseServeBatch(s, dir, batch, k))
    }
    queries.writeStream.foreachBatch(fn).outputMode(OutputMode.Update())
  }

  /** The proximity half of the serving tier: each micro-batch's query
    * docs contribute their (first, first-differing) token pair; the
    * plane-sweep core emits per-query min-distance top-k. Parity with
    * tx_proximity pinned by PositionalStreamSpec.
    */
  def serveProximity(queries: DataFrame, s: SparkSession, dir: String)(
      sink: DataFrame => Unit): DataStreamWriter[Row] = {
    val fn: (DataFrame, Long) => Unit = { (batch, _) =>
      if (!batch.isEmpty) sink(Positional.proximityServeBatch(s, dir, batch))
    }
    queries.writeStream.foreachBatch(fn).outputMode(OutputMode.Update())
  }

  /** The generation-bound form: resolve `_latest` per micro-batch,
    * reload the postings only when the generation number changed — a
    * republished positional index
    * ([[Positional.writePositionalGeneration]]) cuts over LIVE between
    * micro-batches; rollback is the same pointer pointed backwards.
    * A vanished pointer is an error, not license to serve a stale
    * cached generation (the [[Bm25Stream.serveLatest]] contract).
    */
  def serveLatest(queries: DataFrame, root: String, k: Int = 10)(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    serveLatestWith(queries, root)((s, g, batch) =>
      Positional.phraseServeGenBatch(s, g, batch, k))(sink)

  /** Generation-bound proximity serving — same pointer protocol. */
  def serveLatestProximity(queries: DataFrame, root: String)(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    serveLatestWith(queries, root)(
      Positional.proximityServeGenBatch(_, _, _))(sink)

  /** Generation-bound CAPPED phrase serving — tx_phrase_capped's
    * contract per micro-batch: candidates from the generation's
    * committed truncated anchor lists (bounded at P per anchor at any
    * df), full-postings verification, per-answer exact flag. Same
    * pointer protocol. */
  def serveLatestCapped(queries: DataFrame, root: String, k: Int = 10)(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    serveLatestWith(queries, root)((s, g, batch) =>
      Positional.phraseCappedServeGenBatch(s, g, batch, k))(sink)

  /** Generation-bound BIGRAM-route phrase serving — exact
    * tx_phrase_search answers (route equivalence, parity-pinned) with
    * candidates bounded by the rarer bigram's df instead of the rarest
    * word's: the committed `gen-N/bigrams` slice probed bucket-pruned,
    * same pointer protocol. */
  def serveLatestBigram(queries: DataFrame, root: String, k: Int = 10)(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    serveLatestWith(queries, root)((s, g, batch) =>
      Positional.phraseBigramServeGenBatch(s, g, batch, k))(sink)

  /** The PRODUCTION phrase-serving entry point — the expressed route
    * choice ([[Positional.phraseServeGenBatchAuto]]): full-length
    * phrases (the query text IS the phrase), served EXACT through the
    * biword chain whenever the generation carries the `bigrams` slice
    * (the measured default: exact at less than the lossy tier's cost),
    * falling back to the P-cut bound (capped candidates + exact flag)
    * on pre-bigram generations, with 1-token phrases on the word
    * route. Every answer row names its route — the choice is in the
    * API, not in prose. Same pointer protocol as every serving tier.
    */
  def serveLatestAuto(queries: DataFrame, root: String, k: Int = 10)(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    serveLatestWith(queries, root)((s, g, batch) =>
      Positional.phraseServeGenBatchAuto(s, g, batch, k))(sink)

  /** Generation-bound SNIPPET serving — tx_snippet's contract (best
    * phrase doc + first-match context window) per micro-batch from the
    * committed postings, same pointer protocol. Completes the
    * positional tier's serving surface: phrase, proximity, snippet. */
  def serveLatestSnippet(queries: DataFrame, root: String)(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    serveLatestWith(queries, root)(
      Positional.snippetServeGenBatch(_, _, _))(sink)

  private def serveLatestWith(queries: DataFrame, root: String)(
      score: (SparkSession, Positional.PositionalGeneration, DataFrame) => DataFrame)(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    GenServe.latestLoop[Positional.PositionalGeneration](
      queries, root, "positional", _.gen)(
      Positional.loadPositionalGeneration)(score)(sink)
}
