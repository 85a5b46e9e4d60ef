package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** Streaming twin of `dedup_incremental`: a continuous ingest of new
  * documents deduped against a STATIC corpus's staged artifacts — the
  * always-on form of the per-batch delta dedup a crawl pipeline runs.
  *
  * Dataflow (everything before the final dedup is a stateless per-row
  * projection, so it runs in append mode with no watermark bookkeeping):
  *
  *  1. tokenize → 3-gram shingles → drop the index-build stop-shingle
  *     list (shipped as a literal array: it is broadcast-sized by
  *     construction — only shingles with df > MaxDf),
  *  2. 12 MinHash permutation minima computed per ROW from the shingle
  *     array ([[Dedup.withBandStructs]] — the shuffle-free formulation of
  *     the staged band index, value-identical to the groupBy route by
  *     DedupStreamSpec's parity pin),
  *  3. band explode → stream-static equi-join against the existing
  *     corpus's staged band index on (band, key),
  *  4. `dropDuplicates(ni, oi)` to collapse multi-band collisions (the
  *     one stateful step — bounded in the always-on form: pass
  *     `ingestTsCol` and the collapse runs as a watermarked
  *     `dropDuplicatesWithinWatermark` with retention-window eviction),
  *  5. stream-static join against the per-doc kept-shingle SETS and a
  *     per-row exact-Jaccard verify (`array_intersect` — no aggregation),
  *     emitting (new_id, dup_of, jac) matches ≥ 0.5 in append mode.
  *
  * At 100 TB the static sides are stored tables bucketed by (band, key)
  * and doc_id respectively, so both stream-static joins are co-located;
  * the per-ingest cost is O(batch), never an existing-corpus rescan.
  */
object DedupStream {

  /** All verified (new_id, dup_of, jac) matches of `newDocs` — a
    * streaming DataFrame with (doc_id, text) — against the existing
    * (doc_id % 5 != 0) side of `dir`'s staged dedup index. Append-safe.
    *
    * State bounding (the always-on form): when `ingestTsCol` names an
    * event-time TIMESTAMP column on `newDocs`, the multi-band collision
    * collapse runs as `dropDuplicatesWithinWatermark` under a
    * `dedupRetention` watermark — (ni, oi) pair state is EVICTED once
    * the watermark passes its ingest time by the retention, so the
    * store tracks the recent ingest window, not lifetime pairs (the
    * same bounded-state contract as
    * [[AnnStream.ServedStateRetention]]: a band collision re-arriving
    * INSIDE retention is collapsed exactly; one re-arriving after
    * eviction re-emits its match, and downstream drop-list application
    * is idempotent on identical match rows).
    *
    * The watermark ADMISSION bound is part of the contract, both ways:
    * like every watermarked stream, a FIRST delivery whose ingest time
    * is already more than `dedupRetention` behind the max event time
    * seen is late data — dropped before the dedup state is consulted,
    * its match never emitted. Output is therefore at-least-once FOR
    * deliveries inside the bound; size `dedupRetention` to cover the
    * worst cross-source ingest-timestamp skew plus the re-delivery
    * horizon, or stamp `ingestTsCol` at the stream's own front door
    * (arrival time, monotone per source) so no first delivery can be
    * late. With `ingestTsCol = None` (bounded backfills, parity
    * replays) the unwatermarked `dropDuplicates` keeps exact
    * lifetime-run semantics and state ∝ distinct colliding pairs.
    */
  def matches(newDocs: DataFrame, s: SparkSession, dir: String,
      ingestTsCol: Option[String] = None,
      dedupRetention: String = "10 minutes"): DataFrame = {
    import graft.queries.QueryFns.wsTokens
    // index-build artifacts (static sides)
    val hotArr = Dedup.hotShingleList(s, dir)
    val oldBands = Dedup.minhashBandIndex(s, dir)
      .filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id").as("oi"), col("band"), col("key"))
    val oldSets = Dedup.keptSets(s, dir)
      .filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id").as("oi"), col("shs").as("shs_old"),
        col("n_sh").as("n_old"))

    val tsCols = ingestTsCol.map(col).toSeq
    val collided = bandCollisions(newDocs, hotArr, oldBands, tsCols)
    val deduped = ingestTsCol match {
      case Some(ts) =>
        collided.withWatermark(ts, dedupRetention)
          .dropDuplicatesWithinWatermark("ni", "oi")
          .drop(ts)
      case None =>
        // exact lifetime-run dedup; state ∝ distinct colliding pairs —
        // right for bounded backfills, not the always-on deployment
        collided.dropDuplicates("ni", "oi")
    }
    verifiedMatches(deduped, oldSets)
  }

  /** Tokenize → shingle → drop the index-build stop list → per-row
    * MinHash bands → explode → (band, key) equi-join against the stored
    * band index: the candidate half of the ingest dedup, shared by the
    * session-corpus and generation-bound forms. */
  private def bandCollisions(newDocs: DataFrame, hotArr: Array[String],
      oldBands: DataFrame, tsCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    import graft.queries.QueryFns.wsTokens
    val prepared = newDocs
      .select(col("doc_id").as("ni") +: wsTokens(col("text")).as("toks") +: tsCols: _*)
      .select(col("ni") +:
        array_except(Dedup.shingles(col("toks")), typedlit(hotArr.toSeq)).as("shs") +:
        tsCols: _*)
      .filter(size(col("shs")) > 0)
      .withColumn("n_new", size(col("shs")))
    Dedup.withBandStructs(prepared, "shs")
      .select(Seq(col("ni"), col("shs"), col("n_new"), explode(col("_bands")).as("bk")) ++ tsCols: _*)
      .select(Seq(col("ni"), col("shs"), col("n_new"), col("bk.band"), col("bk.key")) ++ tsCols: _*)
      .join(oldBands, Seq("band", "key"))
  }

  /** The exact-Jaccard verification half: per collapsed (ni, oi) pair,
    * one `array_intersect` against the stored kept-shingle sets, kept
    * at jac ≥ 0.5. */
  private def verifiedMatches(deduped: DataFrame, oldSets: DataFrame): DataFrame =
    deduped
      .join(oldSets, "oi")
      .withColumn("inter", size(array_intersect(col("shs"), col("shs_old"))))
      .withColumn("jac",
        col("inter").cast("double") / (col("n_new") + col("n_old") - col("inter")))
      .filter(col("jac") >= 0.5)
      .select(col("ni").as("new_id"), col("oi").as("dup_of"),
        round(col("jac"), 6).as("jac"))

  /** GENERATION-BOUND ingest dedup: each micro-batch of (doc_id, text)
    * new documents is deduped against the COMMITTED dedup generation
    * under `root` ([[graft.queries.Dedup.writeBandGeneration]]'s
    * `gen-N/{bands, hot, sets}`), with the `_latest` pointer re-resolved
    * per batch and the slices reloaded only when the generation number
    * changed — the [[Bm25Stream.serveLatest]] device on the dedup tier.
    * This closes the rebuild loop's third family: when
    * [[graft.queries.RebuildPolicy.applyPolicy]] commits a new band
    * generation on a stop-line crossing, the ingest dedup cuts over
    * LIVE on the very next batch, no query restart; rollback is the
    * pointer pointed backwards.
    *
    * Semantics per batch are [[matches]]'s exactly (same shingle prep
    * against the generation's OWN stop list — an ingest batch must drop
    * the shingles the stored index's build dropped, or its minima
    * diverge; band-collision candidates; exact-Jaccard ≥ 0.5 verify),
    * restricted to the generation rows passing `existingFilter` (the
    * gate parity's incremental-split convention; a production root
    * committed from the existing corpus keeps the default `true`). Self
    * pairs (a new id already present in the generation) are excluded.
    *
    * foreachBatch form: the multi-band collision collapse is per batch
    * — a pair colliding again in a LATER batch re-emits its match,
    * which downstream drop-list application absorbs (idempotent on
    * identical match rows, the [[matches]] post-eviction contract).
    */
  def matchesLatest(newDocs: DataFrame, root: String,
      existingFilter: org.apache.spark.sql.Column = lit(true))(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    GenServe.latestLoop[(Long, Array[String], DataFrame, DataFrame)](
      newDocs, root, "dedup", _._1) { (s, r) =>
      val g = Dedup.loadDedupGeneration(s, r)
      (g.gen, g.hotOrFail,
        g.bands.filter(existingFilter)
          .select(col("doc_id").as("oi"), col("band"), col("key")),
        g.setsOrFail.filter(existingFilter)
          .select(col("doc_id").as("oi"), col("shs").as("shs_old"),
            col("n_sh").as("n_old")))
    } { (_, g, batch) =>
      val (_, hotArr, oldBands, oldSets) = g
      verifiedMatches(
        bandCollisions(batch, hotArr, oldBands, Seq.empty)
          .filter(col("ni") =!= col("oi"))
          .dropDuplicates("ni", "oi"),
        oldSets)
    }(sink)

  /** Streaming twin of `dedup_emb_incremental`: a continuous ingest of
    * new vectors deduped against the static corpus. Cell assignment runs
    * per ROW via [[AnnStream.assignCell]] over the collected trained
    * centroids (broadcast-sized, nlist ∝ √n — the same task-local
    * artifact AnnStream ships; in-stream parity with the batch
    * assignment is AnnStreamSpec's pin), then one stream-static join
    * brings in the assigned cell's existing occupants and a per-row
    * FloatDot cosine verifies. ZERO stateful operators — each new
    * vector's matches are complete within its own micro-batch, so the
    * whole pipeline is an append-mode projection + join.
    */
  def embMatches(
      newVecs: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      s: SparkSession, dir: String): DataFrame = {
    import graft.functions.FloatDot.floatDot
    import graft.queries.Similarity
    val centroids = Similarity.trainedCentroidArrays(s, dir)
    val existing = Similarity.embIncrementalExisting(s, dir)
    import s.implicits._
    newVecs
      .map { case (id, emb) => (id, AnnStream.assignCell(emb, centroids), emb) }
      .toDF("ni", "alabel", "en")
      .withColumn("nn", floatDot(col("en"), col("en")))
      .join(existing, "alabel")
      .withColumn("cos", floatDot(col("en"), col("eo")) / sqrt(col("nn") * col("no")))
      .filter(col("cos") >= 0.4)
      .select(col("ni").as("new_id"), col("oi").as("dup_of"),
        round(col("cos"), 6).as("cos"))
  }
}
