package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Retrieval

/** Streaming twin of `tx_nb_score`: classify a continuous document
  * ingest under the STATIC corpus's trained naive-Bayes quality model —
  * the always-on form of the model-based quality filter (train the
  * classifier offline on labeled data, score every arriving doc at the
  * door; the GPT-3-style classifier gate as a serving path).
  *
  * Stateless per-row projection — no shuffle, no watermark — so it runs
  * in append mode and each doc's verdict is complete within its own
  * micro-batch, composing with the CurationStream/DedupStream ingest
  * DAG exactly like LmScoreStream.
  *
  * Parity: the model ships as EXACT scaled-long micros of the batch
  * side's 6-decimal log-odds (collected from the same Spark
  * expressions, never recomputed); the per-row fold sums
  * `n · lo_micros` in long arithmetic, which equals the batch side's
  * order-independent DECIMAL(…,6) sum by construction, and the final
  * micros→double division is the same correctly-rounded value as the
  * batch's DECIMAL→DOUBLE cast. NbScoreStreamSpec pins bit-identical
  * rows against tx_nb_score across micro-batch splits.
  */
object NbScoreStream {

  /** Per-arriving-document (doc_id, n_tok, score, pred) — append-safe.
    * Docs with no tokens are dropped (they have no postings on the
    * batch side either). */
  def scores(newDocs: DataFrame, s: SparkSession, dir: String): DataFrame = {
    import graft.queries.QueryFns.wsTokens
    val (loMap, loU, prior) = Retrieval.nbScoreParams(s, dir)
    val loCol: Column = typedlit(loMap)
    newDocs
      .select(col("doc_id"), wsTokens(lower(col("text"))).as("toks"))
      .withColumn("m", size(col("toks")))
      .filter(col("m") > 0)
      // Σ_w n_w · lo_w is just each token contributing its own log-odds
      // once: ONE linear fold over the tokens. (The first cut folded
      // array_distinct with a nested per-word filter — O(tokens²) per
      // doc, the same hazard class as the BPE word-length cap: invisible
      // on 60-token synthetic docs, hours on a 100k-token book.)
      .withColumn("sm", aggregate(
        col("toks"), lit(0L),
        (acc, w) => acc + coalesce(element_at(loCol, w), lit(loU))))
      .select(col("doc_id"), col("m").cast("long").as("n_tok"),
        round(lit(prior) + col("sm").cast("double") / 1e6, 4).as("score"),
        when(lit(prior) + col("sm").cast("double") / 1e6 > 0, 1L)
          .otherwise(0L).as("pred"))
  }
}
