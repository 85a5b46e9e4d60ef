package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Model shipping: the vocabulary→log-odds map travels as a Spark
  * BROADCAST VARIABLE (torrent-distributed once per executor), NOT a
  * plan literal — a vocabulary-sized `typedlit` embeds the map in every
  * task binary, which is the "large task binary" warning class and
  * grows the serialized plan linearly with the vocabulary. Tokenization
  * stays in Column land (the exact batch tokenizer expressions), and
  * only the per-row fold runs in `mapPartitions` against the broadcast
  * map.
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
    import s.implicits._
    val (loMap, loU, prior) = Retrieval.nbScoreParams(s, dir)
    // the prior is a 6-decimal value held as its nearest double — the
    // scaled-long recovery is exact
    val priorMicros = math.round(prior * 1e6)
    val bc = s.sparkContext.broadcast(loMap)
    newDocs
      .select(col("doc_id"), wsTokens(lower(col("text"))).as("toks"))
      .withColumn("m", size(col("toks")))
      .filter(col("m") > 0)
      .as[(Long, Seq[String], Int)]
      // Σ_w n_w · lo_w is just each token contributing its own log-odds
      // once: ONE linear fold over the tokens in scaled-long micros.
      // (The first cut folded array_distinct with a nested per-word
      // filter — O(tokens²) per doc, the same hazard class as the BPE
      // word-length cap: invisible on 60-token synthetic docs, hours on
      // a 100k-token book.)
      .mapPartitions { it =>
        val lo = bc.value
        it.map { case (id, toks, m) =>
          var sm = 0L
          toks.foreach(w => sm += lo.getOrElse(w, loU))
          (id, m.toLong, sm)
        }
      }
      .toDF("doc_id", "n_tok", "sm")
      // prior + sum as one exact micros addition, then ONE long→double
      // division (correctly rounded — the same value as the batch
      // side's DECIMAL→DOUBLE cast); sign decided in exact longs
      .select(col("doc_id"), col("n_tok"),
        ((lit(priorMicros) + col("sm")).cast("double") / 1e6).as("score"),
        when(lit(priorMicros) + col("sm") > 0, 1L)
          .otherwise(0L).as("pred"))
  }
}
