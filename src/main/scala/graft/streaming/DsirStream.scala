package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.TextAnalysis

/** Streaming twin of `tx_dsir_weights`: score a continuous ingest of
  * documents with the DSIR importance weight estimated from a STATIC
  * corpus — data selection applied at the door (keep/route by target
  * affinity as documents arrive, never rescan the corpus), the ingest
  * complement of the batch selection query `tx_dsir_select`.
  *
  * Stateless per-row projection — no shuffle, no watermark, no stateful
  * operator — so it runs in append mode and each document's weight is
  * complete within its own micro-batch. The per-row fold over the
  * SORTED distinct-term list replays the batch side's word-sorted
  * sequential double sum exactly (same smoothed ln-difference
  * parenthesization), so weights are bit-identical to the batch query
  * (DsirStreamSpec's parity pin).
  *
  * Out-of-vocabulary terms (impossible in the parity set, whose
  * documents built the ratio table) contribute 0 via `coalesce`; a
  * production deployment at an unbounded vocabulary switches to the
  * hashed-bigram feature space (`tx_dsir_hashed`), whose fixed bucket
  * table ships the same way at any corpus size.
  */
object DsirStream {

  /** Per-arriving-document (doc_id, lang, n_tok, avg_logw) — append-safe. */
  def weights(newDocs: DataFrame, s: SparkSession, dir: String): DataFrame = {
    import graft.queries.QueryFns.wsTokens
    val (ratio, nTgt, nRaw, vSize) = TextAnalysis.dsirRatioMap(s, dir)
    val lnTgtV = math.log((nTgt + vSize).toDouble)
    val lnRawV = math.log((nRaw + vSize).toDouble)
    val rCol: Column = typedlit(ratio)
    newDocs
      .select(col("doc_id"), col("lang"), wsTokens(lower(col("text"))).as("toks"))
      .withColumn("m", size(col("toks")))
      .filter(col("m") > 0)
      .withColumn("lw", aggregate(
        array_sort(array_distinct(col("toks"))), lit(0.0),
        (acc, w) => acc + coalesce(
          size(filter(col("toks"), x => x === w)).cast("double")
            * ((log(element_at(rCol, w).getField("_1").cast("double") + 1.0)
                - lit(lnTgtV))
              - (log(element_at(rCol, w).getField("_2").cast("double") + 1.0)
                - lit(lnRawV))),
          lit(0.0))))
      .select(col("doc_id"), col("lang"), col("m").cast("long").as("n_tok"),
        (round(col("lw") / col("m"), 4) + 0.0).as("avg_logw"))
  }
}
