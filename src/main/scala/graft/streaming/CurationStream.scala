package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.TextAnalysis

/** Streaming twin of `tx_quality_lang`: language-detect and
  * quality-score a continuous ingest of documents AT THE DOOR — the
  * always-on form of the curation gate a crawl pipeline applies before
  * anything else touches a document (gate first, so every downstream
  * stage — dedup, LM scoring, packing — reads only survivors).
  *
  * The whole pipeline is the SAME stateless per-row projection as the
  * batch query ([[TextAnalysis.langQualityScores]], shared expression
  * for expression, so scores are bit-identical by construction —
  * CurationStreamSpec pins it anyway): one tokenize, four codegen'd
  * stopword filters, the detected language's count doubling as the
  * quality score's stopword term. No shuffle, no watermark, no state —
  * append mode, each doc's verdict complete within its own micro-batch,
  * per-batch cost ∝ batch size at any corpus scale.
  *
  * Unlike the LM/DSIR ingest twins there is no trained artifact to
  * ship: the stopword lists are compile-time constants, so this gate
  * runs before a corpus generation even exists — it is the FIRST stage
  * of the ingest chain, feeding [[DedupStream]] / [[LmScoreStream]].
  */
object CurationStream {

  /** Per-arriving-document (doc_id, pred_lang, n_tok, stop_ratio,
    * quality, admitted) — append-safe. `threshold` is the curation
    * pipelines' quality gate (their shared 0.7 default).
    */
  def qualityGate(newDocs: DataFrame, threshold: Double = 0.7): DataFrame =
    TextAnalysis.langQualityScores(newDocs)
      // token-free docs score 0.5 (`least` skips the NULL stopword
      // ratio; a crawl front door sees empty docs routinely) — below
      // any sane threshold. The coalesce makes the verdict's
      // never-NULL contract explicit rather than an artifact of
      // `least`'s null-skipping: rejected, not unjudged.
      .withColumn("admitted", coalesce(col("quality") >= threshold, lit(false)))

  /** Only the admitted documents, with their scores — the frame the
    * rest of the ingest chain consumes.
    */
  def survivors(newDocs: DataFrame, threshold: Double = 0.7): DataFrame =
    qualityGate(newDocs, threshold).filter(col("admitted")).drop("admitted")

  /** Admitted documents with their TEXT intact — the (doc_id, text)
    * frame the downstream ingest twins take, so the whole always-on
    * chain composes as ONE streaming DAG:
    * `survivorDocs → DedupStream.matches` / `LmScoreStream.scores`
    * (gate first, every later stage reads only survivors —
    * CurationStreamSpec pins both chains against their batch
    * compositions). Still a stateless projection + filter; whatever
    * state the chain holds belongs to the downstream stage.
    */
  def survivorDocs(newDocs: DataFrame, threshold: Double = 0.7): DataFrame =
    TextAnalysis.langQualityScores(newDocs, keep = Seq("text"))
      .filter(col("quality") >= threshold)
      .select(col("doc_id"), col("text"))
}
