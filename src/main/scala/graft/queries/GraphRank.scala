package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Staging, Tables}

/** Source-graph curation — link-analysis quality signals over the
  * corpus's SOURCE (domain) structure, the graph leg of the
  * training-data pipeline:
  *
  *  - `gr_source_graph` — the shared-content graph: an edge (sa, sb, w)
  *    between two sources weighted by how many distinct df-filtered
  *    shingles they both contain. This is the mirror/scraper-detection
  *    signal CommonCrawl-scale curation runs: sources that share
  *    substantial verbatim content are mirrors, aggregators, or
  *    scrapers of one another.
  *  - `gr_source_rank` — weighted PageRank (Brin & Page) over that
  *    graph, [[Iters]] fixed iterations at damping [[Damping]]: a
  *    centrality score per source. Exact-decimal iteration discipline
  *    (per-edge contributions rounded to 6 decimals and summed in
  *    DECIMAL) makes the fixpoint prefix deterministic on both engines,
  *    so the oracle replays it value for value.
  *  - `gr_rank_gate` — the curation application: a rank-proportional
  *    per-source document budget (floor(B·pr/Σpr), B = half the
  *    corpus) — the domain-weighted sampling allocation a pretraining
  *    mix assigns from a quality/centrality signal.
  *  - `gr_rank_sample` — the doc-level selection under those budgets:
  *    per source, the budget-many docs that win a deterministic
  *    md5-order draw (the same device as tx_sample_stratified).
  *
  * Scale posture (100 TB): the edge build is an inverted-index
  * equi-join on the shingle — never all-pairs over sources — and
  * inherits the dedup family's stop-shingle guard (df ≤ 100 docs), so
  * a shingle's source fanout, and with it the per-shingle pair count,
  * is bounded; the staged (doc_id, sh) exchange is SHARED with the
  * dedup family ([[Dedup.shingleExchange]] — one corpus-scale
  * tokenize+hash front end for both families). Each PageRank iteration
  * is one equi-join of the edge list against the previous rank vector
  * keyed by source plus one aggregation keyed by target — vertices are
  * sources (domains), orders of magnitude fewer than documents, and
  * the rank vector never leaves the cluster (a production run would
  * checkpoint it per iteration; here the [[Iters]]-deep plan stays
  * comfortably inside one job). The gate is one broadcast of two
  * 1-row scalar frames; the sampler is a source-partitioned window
  * bounded by the per-source budget. No windows over the corpus, no
  * cartesian products, no driver-side loops over data.
  */
object GraphRank {

  /** PageRank damping (Brin & Page's 0.85) and its teleport complement.
    * [[Teleport]] is written literally (not 1 − 0.85) so the constant
    * is the same exact double on both engines.
    */
  private[queries] val Damping = 0.85
  private[queries] val Teleport = 0.15

  /** Fixed iteration count: 5 is past the knee on a 20-vertex graph
    * (adjacent iterations agree to ~1e-4) while keeping the unrolled
    * oracle CTE chain readable.
    */
  private[queries] val Iters = 5

  /** Session memos: the staged edge list feeds three queries and is
    * read 2·[[Iters]] times by the rank loop; ranks feed the gate and
    * the sampler.
    */
  private val edgeCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private val rankCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def clearCaches(): Unit = {
    edgeCache.clear()
    rankCache.clear()
  }

  /** Distinct (sh, source) pairs from the df-filtered shingle index —
    * the source-level posting list. Distinct-per-source first, so a
    * shingle repeated across many docs of ONE source contributes a
    * single posting (the graph measures shared content, not volume).
    */
  private def srcShingles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.shingleExchange(s, dir)
      .join(Tables(s, dir).documents.select($"doc_id", $"source"), "doc_id")
      .select($"sh", $"source")
      .distinct()
  }

  /** The staged source graph: (sa, sb, w), sa < sb, w = distinct
    * shared shingles. One shuffle on the shingle (the posting-list
    * self-join), one on the (sa, sb) pair.
    */
  private[graft] def sourceEdges(s: SparkSession, dir: String): DataFrame =
    edgeCache.getOrElseUpdate((s, dir), {
      import s.implicits._
      Staging.readElseBuild(s, dir, "source_graph", Seq("documents")) {
        val ss = srcShingles(s, dir)
        ss.toDF("sh", "sa").join(ss.toDF("sh", "sb"), Seq("sh"))
          .filter($"sa" < $"sb")
          .groupBy($"sa", $"sb")
          .agg(count(lit(1)).as("w"))
      }.persist()
    })

  /** [[Iters]] exact-decimal PageRank iterations over the symmetrized
    * edge list. Per directed edge (u, v):
    * c = round(r(u)·w/tw(u), 6), summed per target in DECIMAL(18,6);
    * r'(v) = round(0.15/n + 0.85·Σc, 6). Sources with no edges hold
    * the teleport floor; dangling mass evaporates (documented: ranks
    * sum to slightly under 1 when isolated sources exist), which keeps
    * the update local — no global dangling-mass redistribution term.
    */
  private[graft] def sourceRanks(s: SparkSession, dir: String): DataFrame =
    rankCache.getOrElseUpdate((s, dir), {
      import s.implicits._
      val e = sourceEdges(s, dir)
      val ed = e.select($"sa".as("u"), $"sb".as("v"), $"w")
        .unionByName(e.select($"sb".as("u"), $"sa".as("v"), $"w"))
        .persist()
      val outw = ed.groupBy($"u").agg(sum($"w").as("tw")).persist()
      val verts = Tables(s, dir).documents
        .select($"source".as("v")).distinct().persist()
      val nn = verts.agg(count(lit(1)).as("n"))
      var r = verts.crossJoin(broadcast(nn))
        .select($"v", round(lit(1.0) / $"n", 6).as("r"))
      for (_ <- 1 to Iters) {
        val m = ed.join(outw, "u")
          .join(r.toDF("u", "r"), "u")
          .select($"v",
            round(($"r" * $"w") / $"tw", 6).cast("decimal(18,6)").as("c"))
          .groupBy($"v")
          .agg(sum($"c").cast("double").as("sm"))
        r = verts.join(m, Seq("v"), "left").crossJoin(broadcast(nn))
          .select($"v", round(lit(Teleport) / $"n" +
            lit(Damping) * coalesce($"sm", lit(0.0)), 6).as("r"))
      }
      r.persist()
    })

  /** Per-source rank-proportional budgets: (source, pr, n_docs,
    * budget), budget = floor(B·pr/Σpr) with B = n_docs_total div 2.
    * Σpr is a DECIMAL sum of 6-decimal ranks — exact, so the division
    * is the same double on both engines.
    */
  private def rankGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir).documents
    val perSrc = docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
    val b = docs.agg(count(lit(1)).as("nd_tot"))
      .select(expr("nd_tot div 2").as("b"))
    val sumPr = sourceRanks(s, dir)
      .agg(sum($"r".cast("decimal(18,6)")).cast("double").as("sum_pr"))
    perSrc
      .join(sourceRanks(s, dir).toDF("source", "pr"), "source")
      .crossJoin(broadcast(b))
      .crossJoin(broadcast(sumPr))
      .select($"source", $"pr", $"n_docs",
        floor(($"b".cast("double") * $"pr") / $"sum_pr").cast("long")
          .as("budget"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gr_source_graph" -> { (s, dir) =>
      import s.implicits._
      sourceEdges(s, dir).orderBy($"sa", $"sb")
    },

    "gr_source_rank" -> { (s, dir) =>
      import s.implicits._
      sourceRanks(s, dir)
        .select($"v".as("source"), $"r".as("pr"))
        .orderBy($"pr".desc, $"source")
    },

    "gr_rank_gate" -> { (s, dir) =>
      import s.implicits._
      rankGate(s, dir).orderBy($"source")
    },

    // Doc-level selection under the gate's budgets: per source, the
    // budget-many docs winning the deterministic md5 draw. The window
    // is source-partitioned (tx_sample_stratified's device) and the
    // budget frame is sources-sized — broadcast by the engine.
    "gr_rank_sample" -> { (s, dir) =>
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy(md5($"doc_id".cast("string")), $"doc_id")
      Tables(s, dir).documents
        .select($"doc_id", $"source")
        .withColumn("rn", row_number().over(w))
        .join(rankGate(s, dir).select($"source", $"budget"), "source")
        .filter($"rn" <= $"budget")
        .select($"doc_id", $"source")
        .orderBy($"doc_id")
    }
  )

  /** Shared oracle prefix: [[Dedup.ShingleCte]] (the SAME shingle
    * definition the dedup family verifies against) extended by the
    * source posting list and the edge list.
    */
  private def graphCte: String =
    s"""${Dedup.ShingleCte},
       |ss AS (
       |  SELECT DISTINCT e.sh, d.source
       |  FROM ex e JOIN documents d ON d.doc_id = e.doc_id),
       |e AS (
       |  SELECT a.source AS sa, b.source AS sb, count(*) AS w
       |  FROM ss a JOIN ss b ON a.sh = b.sh AND a.source < b.source
       |  GROUP BY 1, 2)""".stripMargin

  /** Unrolled [[Iters]]-iteration rank CTE chain (r0 … r[[Iters]]),
    * mirroring [[sourceRanks]] operation for operation.
    */
  private def rankCte: String = {
    val iters = (1 to Iters).map { i =>
      s"""r$i AS (
         |  SELECT verts.v,
         |    round(CAST($Teleport AS DOUBLE) / nn.n
         |      + CAST($Damping AS DOUBLE) * coalesce(m.sm, CAST(0 AS DOUBLE)), 6) AS r
         |  FROM verts
         |  LEFT JOIN (
         |    SELECT ed.v,
         |      CAST(sum(CAST(round((p.r * ed.w) / ow.tw, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sm
         |    FROM ed JOIN r${i - 1} p ON p.v = ed.u JOIN outw ow ON ow.u = ed.u
         |    GROUP BY ed.v) m ON m.v = verts.v
         |  CROSS JOIN nn)""".stripMargin
    }.mkString(",\n")
    s"""ed AS (SELECT sa AS u, sb AS v, w FROM e
       |      UNION ALL SELECT sb AS u, sa AS v, w FROM e),
       |outw AS (SELECT u, sum(w) AS tw FROM ed GROUP BY u),
       |verts AS (SELECT DISTINCT source AS v FROM documents),
       |nn AS (SELECT count(*) AS n FROM verts),
       |r0 AS (SELECT v, round(CAST(1 AS DOUBLE) / n, 6) AS r FROM verts, nn),
       |$iters""".stripMargin
  }

  /** Gate CTE on top of r[[Iters]]: per-source budgets. */
  private def gateCte: String =
    s"""ps AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
       |tot AS (SELECT count(*) // 2 AS b FROM documents),
       |sp AS (SELECT CAST(sum(CAST(r AS DECIMAL(18,6))) AS DOUBLE) AS sum_pr FROM r$Iters),
       |g AS (
       |  SELECT ps.source, rr.r AS pr, ps.n_docs,
       |    CAST(floor((CAST(tot.b AS DOUBLE) * rr.r) / sp.sum_pr) AS BIGINT) AS budget
       |  FROM ps JOIN r$Iters rr ON rr.v = ps.source
       |  CROSS JOIN tot CROSS JOIN sp)""".stripMargin

  def oracle: Map[String, String] = Map(
    "gr_source_graph" ->
      s"""$graphCte
         |SELECT sa, sb, w FROM e ORDER BY sa, sb""".stripMargin,

    "gr_source_rank" ->
      s"""$graphCte,
         |$rankCte
         |SELECT v AS source, r AS pr FROM r$Iters ORDER BY pr DESC, source""".stripMargin,

    "gr_rank_gate" ->
      s"""$graphCte,
         |$rankCte,
         |$gateCte
         |SELECT source, pr, n_docs, budget FROM g ORDER BY source""".stripMargin,

    "gr_rank_sample" ->
      s"""$graphCte,
         |$rankCte,
         |$gateCte,
         |rn AS (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         |  FROM documents)
         |SELECT rn.doc_id, rn.source FROM rn
         |JOIN g ON g.source = rn.source
         |WHERE rn.rn <= g.budget
         |ORDER BY doc_id""".stripMargin
  )
}
