package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.TextAnalysis

/** Streaming twin of `tx_unigram_logprob`: score a continuous ingest of
  * documents under a STATIC corpus's staged unigram LM — the always-on
  * form of the CCNet-style fluency gate a crawl pipeline applies at the
  * door (score at ingest, route to head/middle/tail or drop, never
  * rescan the corpus).
  *
  * The whole pipeline is a stateless per-row projection — no shuffle,
  * no watermark, no stateful operator — so it runs in append mode and
  * each document's score is complete within its own micro-batch:
  *
  *  1. tokenize (lowercased whitespace tokens, the batch tokenizer),
  *  2. per-row fold over the SORTED distinct-term list: each term adds
  *     `n · (ln cnt − ln N)` with `cnt` looked up in the shipped LM map
  *     and `n` counted from the row's own token array. The fold replays
  *     the batch side's word-sorted sequential double sum exactly, so
  *     scores are bit-identical to `tx_unigram_logprob`
  *     (LmScoreStreamSpec's parity pin).
  *
  * Out-of-vocabulary terms (impossible in the batch parity set, whose
  * documents built the LM) contribute 0 — the production deployment
  * would reserve a smoothed OOV mass instead; one `coalesce` constant.
  *
  * The LM ships as a map literal (broadcast-sized at the gate corpora);
  * at a 100 TB vocabulary the same per-row shape loads a task-local
  * hashmap from the staged parquet inside `mapPartitions`.
  */
object LmScoreStream {

  /** Per-arriving-document (doc_id, n_tok, avg_logprob) — append-safe. */
  def scores(newDocs: DataFrame, s: SparkSession, dir: String): DataFrame = {
    import graft.queries.QueryFns.wsTokens
    val (lm, nTotal) = TextAnalysis.unigramLmMap(s, dir)
    val lnN = math.log(nTotal.toDouble)
    val lmCol: Column = typedlit(lm)
    newDocs
      .select(col("doc_id"), wsTokens(lower(col("text"))).as("toks"))
      .withColumn("m", size(col("toks")))
      .filter(col("m") > 0)
      .withColumn("lp", aggregate(
        array_sort(array_distinct(col("toks"))), lit(0.0),
        (acc, w) => acc + coalesce(
          size(filter(col("toks"), x => x === w)).cast("double")
            * (log(element_at(lmCol, w).cast("double")) - lit(lnN)),
          lit(0.0))))
      .select(col("doc_id"), col("m").cast("long").as("n_tok"),
        round(col("lp") / col("m"), 4).as("avg_logprob"))
  }

  /** Streaming twin of `tx_bigram_logprob`: per-arriving-document
    * (doc_id, n_big, avg_logprob) under the static corpus's staged
    * bigram + unigram LMs — the same stateless per-row shape as
    * [[scores]]. The fold replays the batch side's (w1, w2)-sorted
    * sequential double sum over the row's DISTINCT adjacent pairs
    * (struct sort — not a string sort of joined keys, which a
    * sub-space control character in a token could reorder), with the
    * same interpolation expression, so scores are bit-identical to the
    * batch query (LmScoreStreamSpec's parity pin). Pairs absent from
    * the shipped bigram LM are excluded from both the sum AND the
    * pair count — exactly the batch side's inner-join semantics.
    */
  def bigramScores(newDocs: DataFrame, s: SparkSession, dir: String): DataFrame = {
    import graft.queries.QueryFns.wsTokens
    val (big, uni, nTotal, vSize) = TextAnalysis.bigramLmMap(s, dir)
    val bigCol: Column = typedlit(big)
    val uniCol: Column = typedlit(uni)
    val floorDen = lit((nTotal + vSize).toDouble)
    def key(p: Column): Column =
      concat(p.getField("w1"), lit(" "), p.getField("w2"))
    newDocs
      .select(col("doc_id"), wsTokens(lower(col("text"))).as("toks"))
      .withColumn("pairs", zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
      .withColumn("kept", filter(array_sort(array_distinct(col("pairs"))),
        p => element_at(bigCol, key(p)).isNotNull))
      // n(p) recounted from the row's own pair array; m = Σ n over KEPT
      // pairs (the batch side's post-join sum(n))
      .withColumn("m", aggregate(col("kept"), lit(0L), (acc, p) =>
        acc + size(filter(col("pairs"),
          x => x.getField("w1") === p.getField("w1")
            && x.getField("w2") === p.getField("w2"))).cast("long")))
      .filter(col("m") > 0)
      .withColumn("lp", aggregate(col("kept"), lit(0.0), (acc, p) =>
        acc + size(filter(col("pairs"),
          x => x.getField("w1") === p.getField("w1")
            && x.getField("w2") === p.getField("w2"))).cast("double")
          * log(lit(TextAnalysis.BigramLambda)
              * (element_at(bigCol, key(p)).cast("double")
                / element_at(uniCol, p.getField("w1")).cast("double"))
            + (lit(1.0) - lit(TextAnalysis.BigramLambda))
              * ((element_at(uniCol, p.getField("w2")) + lit(1L)).cast("double")
                / floorDen))))
      .select(col("doc_id"), col("m").as("n_big"),
        round(col("lp") / col("m"), 4).as("avg_logprob"))
  }

  /** Streaming twin of `tx_bpe_token_count`: per-arriving-document
    * (doc_id, n_ws, n_bpe) under the static corpus's TRAINED tokenizer
    * — token budgeting at ingest. Stateless per-row fold over the
    * token array against the shipped segmentation vocabulary
    * (alphabetic words bill their symbol count, everything else 1),
    * append-safe; batch parity pinned by LmScoreStreamSpec.
    */
  def bpeTokenCounts(newDocs: DataFrame, s: SparkSession, dir: String): DataFrame = {
    import graft.queries.QueryFns.wsTokens
    val segCol: Column = typedlit(TextAnalysis.bpeSegmentMap(s, dir))
    newDocs
      .select(col("doc_id"), wsTokens(lower(col("text"))).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_ws"),
        aggregate(col("toks"), lit(0L), (acc, w) =>
          acc + coalesce(element_at(segCol, w), lit(1L))).as("n_bpe"))
  }
}
