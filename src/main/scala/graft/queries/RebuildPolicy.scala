package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The COMPOSED rebuild-trigger policy — the decision layer over the
  * three per-family drift monitors. Each retrieval family keeps an
  * oracle-checked staleness meter (`dedup_hot_drift` for the shingle
  * exchange, `ann_centroid_drift` for the trained IVF cells,
  * `tx_corpus_drift` for the lexical token distribution); a production
  * ingest loop does not read three dashboards — it reads ONE verdict
  * per family and schedules that family's offline rebuild
  * ([[Dedup]] band-index regeneration, a [[Similarity]] Lloyd retrain +
  * generation commit, a [[Retrieval.writeLexicalGeneration]] republish)
  * when its monitor crosses the documented threshold. `tx_rebuild_policy`
  * is that verdict table: (family, metric, value, threshold, rebuild),
  * one row per family, built by composing the SAME query functions the
  * meters publish (never a re-derivation that could drift from them) —
  * and the oracle composes the same three published oracle statements,
  * so the policy can never silently diverge from its inputs.
  *
  * Thresholds (measured against the natural readings at sf0.001/0.01/
  * 0.1 — see the constants):
  *  - dedup: ANY batch shingle crossing the df stop line makes the
  *    merged band index stale for that shingle class → rebuild at the
  *    first crossing. Natural reading at every gate SF: 0.
  *  - vector: the worst per-cell squared-L2 centroid shift (leading 4
  *    dims, ppm). Natural readings 206–603 ppm across the gate SFs —
  *    ingest-batch noise; 2000 ppm is ~3× the worst natural reading,
  *    the retrain line. A planted embedding shift reads ~10⁵ ppm
  *    (RebuildPolicySpec).
  *  - lexical: JS divergence between the stored and arriving unigram
  *    distributions. Natural readings ≤ 0.0017 nats; 0.01 is ~6× that,
  *    against a ln(2)/2 ≈ 0.347 maximum.
  *
  * Scale posture (100 TB): the policy adds ONE row-per-family union on
  * top of meters that are already scale-shaped (each is token/shingle/
  * cell-keyed aggregation — nothing pairwise); the verdict frame is
  * 3 rows.
  */
object RebuildPolicy {

  /** Rebuild the dedup band index at the FIRST stop-line crossing. */
  private[queries] val DedupCrossThreshold = 1.0

  /** Worst-cell centroid shift (ppm of squared L2 over the leading 4
    * dims) that triggers a Lloyd retrain — ~3× the worst natural
    * ingest-split reading (603 ppm at sf0.001). */
  private[queries] val VectorDriftPpmThreshold = 2000.0

  /** Token-distribution JS divergence (nats) that triggers a lexical
    * index republish — ~6× the worst natural reading (0.0017 at
    * sf0.01), far under the ln(2)/2 one-sided maximum. */
  private[queries] val LexicalJsThreshold = 0.01

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_rebuild_policy" -> { (s, dir) =>
      import s.implicits._
      val ded = Dedup.queries("dedup_hot_drift")(s, dir)
        .select(lit("dedup").as("family"),
          lit("n_crossed").as("metric"),
          $"n_crossed".cast("double").as("value"),
          lit(DedupCrossThreshold).as("threshold"))
      val vec = Similarity.queries("ann_centroid_drift")(s, dir)
        .agg(max($"drift4_ppm").as("v"))
        .select(lit("vector").as("family"),
          lit("max_drift4_ppm").as("metric"),
          $"v".as("value"),
          lit(VectorDriftPpmThreshold).as("threshold"))
      val lex = TextAnalysis.queries("tx_corpus_drift")(s, dir)
        .select(lit("lexical").as("family"),
          lit("js_divergence").as("metric"),
          $"js".as("value"),
          lit(LexicalJsThreshold).as("threshold"))
      ded.unionByName(vec).unionByName(lex)
        .select($"family", $"metric", $"value", $"threshold",
          when($"value" >= $"threshold", 1L).otherwise(0L).as("rebuild"))
        .orderBy($"family")
    }
  )

  /** Act on the verdicts — the loop-closure step a production
    * scheduler runs after the policy query: for each family whose
    * verdict reads rebuild AND whose serving-generation root is
    * supplied, commit that family's next generation from the corpus at
    * `dir` (the serving tiers then cut over LIVE on their next
    * micro-batch through their `_latest` pointers — no restart).
    * Returns family → committed generation for the rebuilds actually
    * performed; an all-quiet policy returns an empty map and writes
    * nothing. Families map to their generation writers: `lexical` →
    * [[Retrieval.writeLexicalGeneration]] (BM25 + QL slices), `vector`
    * → [[Similarity.writeServingGeneration]], `dedup` →
    * [[Dedup.writeBandGeneration]] (the MinHash band index on the same
    * pointer protocol — a stop-line crossing commits the next band
    * generation instead of waiting for the staging layer's next corpus
    * fingerprint).
    */
  def applyPolicy(s: SparkSession, dir: String,
      roots: Map[String, String]): Map[String, Long] = {
    import s.implicits._
    val known = Set("lexical", "vector", "dedup")
    val unknown = roots.keySet -- known
    require(unknown.isEmpty,
      s"no generation writer for families: ${unknown.toSeq.sorted.mkString(",")}")
    val fire = queries("tx_rebuild_policy")(s, dir)
      .filter($"rebuild" === 1L)
      .select($"family").collect().map(_.getString(0)).toSet
    roots.collect {
      case ("lexical", root) if fire("lexical") =>
        "lexical" -> Retrieval.writeLexicalGeneration(s, dir, root)
      case ("vector", root) if fire("vector") =>
        "vector" -> Similarity.writeServingGeneration(s, dir, root)
      case ("dedup", root) if fire("dedup") =>
        "dedup" -> Dedup.writeBandGeneration(s, dir, root)
    }
  }

  /** The oracle composes the three meters' PUBLISHED oracle statements
    * as subqueries (DuckDB allows WITH inside a derived table), so the
    * policy's SQL twin tracks the meters' by construction. */
  def oracle: Map[String, String] = Map(
    "tx_rebuild_policy" ->
      s"""SELECT family, metric, value, threshold,
         |  CAST(CASE WHEN value >= threshold THEN 1 ELSE 0 END AS BIGINT)
         |    AS rebuild
         |FROM (
         |  SELECT 'dedup' AS family, 'n_crossed' AS metric,
         |    CAST(n_crossed AS DOUBLE) AS value,
         |    $DedupCrossThreshold::DOUBLE AS threshold
         |  FROM (${Dedup.oracle("dedup_hot_drift")})
         |  UNION ALL
         |  SELECT 'vector', 'max_drift4_ppm',
         |    (SELECT max(drift4_ppm)
         |     FROM (${Similarity.oracle("ann_centroid_drift")})),
         |    $VectorDriftPpmThreshold::DOUBLE
         |  UNION ALL
         |  SELECT 'lexical', 'js_divergence', js, $LexicalJsThreshold::DOUBLE
         |  FROM (${TextAnalysis.oracle("tx_corpus_drift")}))
         |ORDER BY family""".stripMargin
  )
}
