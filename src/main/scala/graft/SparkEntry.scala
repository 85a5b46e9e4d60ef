package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query module in the library. Each module exposes
  * `queries` (name → (SparkSession, sfDir) ⇒ DataFrame) and `oracle`
  * (name → equivalent DuckDB SQL over the same parquet tables). Every
  * query has a paired oracle (the per-round CORRECTNESS artifact
  * carries the current count). The driver gate checks
  * sf0.01 (plus sf0.001 smoke); sf0.1 was additionally verified
  * hash-exact by manual runs this round (see BASELINE.md).
  *
  * Families (see README.md for the line-by-line coverage matrix):
  *  - [[graft.queries.Analytics]] — TPC-H-shaped SQL surface: joins
  *    (inner/semi/anti/full-outer/as-of), windows (row+range frames),
  *    grouping sets, pivot, subqueries (scalar/correlated), set ops
  *    (set+bag), percentiles, sessionization, histogram, regexp,
  *    string/date/null function families, grouped top-k.
  *  - [[graft.queries.MrQueries]] — the reference's MapReduce apps
  *    (wc, indexer, filestats) declaratively AND through the typed
  *    engine, plus FNV-1a shuffle-bucket parity.
  *  - [[graft.queries.TextAnalysis]] — language-ID, quality, token
  *    counting, fingerprinting, TF-IDF, heavy hitters, sampling, and the
  *    composed curation pipeline.
  *  - [[graft.queries.Dedup]] — exact, n-gram Jaccard, MinHash+LSH,
  *    SimHash, embedding-cosine near-dup, duplicate clustering.
  *  - [[graft.queries.Similarity]] — ANN (brute force, IVF, sign-LSH),
  *    centroids, quantization.
  *  - [[graft.queries.KvQueries]] — the declared KV surface K1–K10:
  *    linearizable replay, reads, dedup, shard routing, rebalance.
  *  - [[graft.queries.GraphRank]] — source-graph curation: the
  *    shared-content source graph, fixed-iteration exact-decimal
  *    PageRank, rank-proportional budget gating/sampling, mirror
  *    components/triangles, and the rank-canonical keep decision.
  *  - [[graft.queries.Positional]] — positional retrieval: exact
  *    phrase search and plane-sweep proximity over the staged
  *    positional postings.
  *  - [[graft.queries.MultimodalQueries]] — binary-column decode
  *    (real PNG/WAV/GVID codecs, pure JDK), box-filter resize, frame
  *    sampling, audio waveform stats, cross-video frame dedup.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Analytics.queries ++
      graft.queries.MrQueries.queries ++
      graft.queries.TextAnalysis.queries ++
      graft.queries.Dedup.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.KvQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.Retrieval.queries ++
      graft.queries.GraphRank.queries ++
      graft.queries.Positional.queries ++
      graft.queries.RebuildPolicy.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Analytics.oracle ++
      graft.queries.MrQueries.oracle ++
      graft.queries.TextAnalysis.oracle ++
      graft.queries.Dedup.oracle ++
      graft.queries.Similarity.oracle ++
      graft.queries.KvQueries.oracle ++
      graft.queries.MultimodalQueries.oracle ++
      graft.queries.Retrieval.oracle ++
      graft.queries.GraphRank.oracle ++
      graft.queries.Positional.oracle ++
      graft.queries.RebuildPolicy.oracle
}
