package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the ANN ingest path: new vectors arrive in a
  * stream and are assigned to the TRAINED coarse-quantizer cells of an
  * existing corpus — the incremental-ingest posture of a production
  * vector store (the index is trained once per corpus epoch; arrivals
  * between retrains join existing cells). The batch assignment
  * ([[graft.queries.Similarity.assignments]]) is the parity oracle,
  * exactly the `ShardStream` ↔ `kv_reroute` discipline applied to
  * `assignments`.
  *
  * Assignment arithmetic mirrors the batch fold bit-for-bit: squared-L2
  * as a sequential left-fold in DOUBLE over the dims (the zip_with +
  * aggregate order), argmin scanned in ascending clabel with strict `<`
  * so ties break to the smaller label (the `min(struct(d, clabel))`
  * contract). `AnnStreamSpec` pins the parity on real corpora in both
  * quantizer regimes (b = 0 and b > 0) rather than assuming the two
  * implementations agree.
  *
  * Scale: the stream is hash-partitioned by assigned cell; state is one
  * record per (cell) holding the per-source dedup high-water (the K4
  * at-least-once contract — same in-order-per-source model as
  * [[ShardStream]]) plus the running occupancy, O(cells + sources)
  * total. The centroid table rides along as task-local data — nlist ∝
  * √n rows, the same broadcast the batch pass ships.
  */
object AnnStream {

  /** One arriving vector. `(src, seq)` is the at-least-once dedup key:
    * sources emit in seq order, re-deliveries repeat an already-seen
    * seq.
    */
  final case class VecEvent(src: Long, seq: Long, vec_id: Long, embedding: Array[Float])

  /** Per-cell live state: occupancy + per-source dedup high-water. */
  final case class CellState(count: Long, lastSeq: Map[Long, Long])

  /** One row per APPLIED (deduped) vector: its cell and the cell's
    * occupancy after ingest.
    */
  final case class AssignUpdate(vec_id: Long, cell: Long, cell_count: Long)

  /** The batch argmin, replicated for per-record serving: sequential
    * DOUBLE fold of squared diffs per centroid, first-smallest wins.
    */
  def assignCell(emb: Array[Float], centroids: Array[(Long, Array[Double])]): Long = {
    var best = -1L
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) { // clabel ascending
      val cv = centroids(c)._2
      var acc = 0.0
      var i = 0
      while (i < cv.length) {
        val diff = emb(i).toDouble - cv(i)
        acc += diff * diff
        i += 1
      }
      if (acc < bestD) { bestD = acc; best = centroids(c)._1 }
      c += 1
    }
    best
  }

  private def applyCell(
      cell: Long,
      events: Iterator[(Long, VecEvent)],
      state: GroupState[CellState]): Iterator[AssignUpdate] = {
    var st = state.getOption.getOrElse(CellState(0L, Map.empty))
    val out = Seq.newBuilder[AssignUpdate]
    events.map(_._2).toSeq.sortBy(e => (e.seq, e.src)).foreach { e =>
      val last = st.lastSeq.getOrElse(e.src, Long.MinValue)
      if (e.seq > last) {
        st = CellState(st.count + 1, st.lastSeq + (e.src -> e.seq))
        out += AssignUpdate(e.vec_id, cell, st.count)
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Wire a (possibly streaming) vector-event Dataset into the live
    * cell-ingest state machine; emits one row per applied vector.
    */
  def assignments(
      events: Dataset[VecEvent],
      centroids: Array[(Long, Array[Double])]): Dataset[AssignUpdate] = {
    import events.sparkSession.implicits._
    events.map(e => (assignCell(e.embedding, centroids), e))
      .groupByKey(_._1)
      .flatMapGroupsWithState[CellState, AssignUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(applyCell)
  }

  /** One row per applied vector under FULL IVF-PQ ingest: the assigned
    * cell plus the M PQ codes — everything the serving index stores per
    * vector, produced in-stream.
    */
  final case class PqIngestUpdate(
      vec_id: Long, cell: Long, cell_count: Long, codes: Array[Int])

  /** The batch PQ code assignment, replicated per record: residual
    * against the assigned cell's centroid, split into M = codebook
    * .length subvectors (h = d / M dims each — the batch slice
    * geometry), each coded by sequential-fold squared-L2 argmin over its
    * subspace codebook with first-smallest (= smaller code) tie-break,
    * the `min(struct(d, code))` contract.
    */
  def pqEncode(
      emb: Array[Float],
      cv: Array[Double],
      codebook: Array[Array[Array[Double]]]): Array[Int] = {
    val m = codebook.length
    val h = emb.length / m
    Array.tabulate(m) { mi =>
      val off = mi * h
      val book = codebook(mi)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) { // code ascending
        val cvq = book(c)
        if (cvq == null) { c += 1 } // untrained seed pattern: no such code
        else {
        var acc = 0.0
        var i = 0
        while (i < h) {
          val diff = (emb(off + i).toDouble - cv(off + i)) - cvq(i)
          acc += diff * diff
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
        }
      }
      best
    }
  }

  private def applyCellPq(codebook: Array[Array[Array[Double]]],
      centroidOf: Map[Long, Array[Double]])(
      cell: Long,
      events: Iterator[(Long, VecEvent)],
      state: GroupState[CellState]): Iterator[PqIngestUpdate] = {
    var st = state.getOption.getOrElse(CellState(0L, Map.empty))
    val out = Seq.newBuilder[PqIngestUpdate]
    val cv = centroidOf(cell)
    events.map(_._2).toSeq.sortBy(e => (e.seq, e.src)).foreach { e =>
      val last = st.lastSeq.getOrElse(e.src, Long.MinValue)
      if (e.seq > last) {
        st = CellState(st.count + 1, st.lastSeq + (e.src -> e.seq))
        out += PqIngestUpdate(e.vec_id, cell, st.count,
          pqEncode(e.embedding, cv, codebook))
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** FULL IVF-PQ incremental ingest: arriving vectors get their trained
    * cell AND their M PQ codes in-stream — the complete per-vector index
    * record of the batch `ann_pq_topk` serving path, so a corpus can
    * grow between index retrains without batch re-encoding. Same
    * per-cell state machine (occupancy + at-least-once dedup); the
    * codebook rides along like the centroids (PqM·K rows — broadcast
    * scale). Parity vs the batch `pqCodes` table is pinned by
    * `AnnStreamSpec`.
    */
  def pqIngest(
      events: Dataset[VecEvent],
      centroids: Array[(Long, Array[Double])],
      codebook: Array[Array[Array[Double]]]): Dataset[PqIngestUpdate] = {
    import events.sparkSession.implicits._
    val centroidOf = centroids.toMap
    events.map(e => (assignCell(e.embedding, centroids), e))
      .groupByKey(_._1)
      .flatMapGroupsWithState[CellState, PqIngestUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        applyCellPq(codebook, centroidOf))
  }

  // ===== Streaming SERVING twin (the query side of the index) =====

  /** One streamed top-k query. `(src, seq)` is the same at-least-once
    * dedup key as [[VecEvent]]; `probe` is the query's identity in the
    * result stream. `nprobe`/`shortlist` are OPTIONAL per-request
    * serving knobs (0 = use the serving tier's defaults): the measured
    * recall ceiling ladder says all marginal recall comes from probing
    * more cells (+0.09 recall per +5k candidate rows at this corpus's
    * geometry), so a production tier lets each REQUEST buy its own
    * recall — a latency-sensitive caller keeps the default, an
    * offline-eval caller sends nprobe=6 — without running two tiers.
    *
    * CONTRACT: a `probe` id names ONE logical query — every delivery
    * under it (whatever its at-least-once (src, seq) identity) must
    * carry the same embedding and the same knobs, and the probe is
    * answered once. Distinct requests — in particular, the same vector
    * at different knobs — are distinct probes; a batch that violates
    * this is served deterministically from its min-(seq, src) delivery
    * and the rest are deduped as re-sends.
    */
  final case class QueryEvent(src: Long, seq: Long, probe: Long,
      embedding: Array[Float], nprobe: Int = 0, shortlist: Int = 0)

  /** One row of the static serving index — the schema
    * [[graft.queries.Similarity.pqServingIndex]] produces: the vector's
    * IVF cell (join key), staged squared norm, M PQ codes in subspace
    * order, and the raw embedding for the shortlist rescore.
    */
  final case class IndexRow(vec_id: Long, cell: Long, norm2: Double,
      codes: Array[Int], embedding: Array[Float])

  /** Per-probe serve state: per-source high-water of already-served
    * seqs — a re-delivered query emits nothing (the K4 at-least-once
    * contract, same as ingest).
    */
  final case class ServeState(lastSeq: Map[Long, Long])

  /** Default retention for a served probe's dedup state when eviction is
    * enabled (the `stateRetention` parameter of [[pqServe]] /
    * [[pqServePruned]]). Unlike the ingest state machines (keyed by CELL
    * — O(nlist), bounded for the index's lifetime), the serving state is
    * keyed by PROBE, and a long-running tier sees an unbounded stream of
    * distinct probes — without eviction the state store grows linearly
    * with lifetime queries. A probe's request lifecycle ends at its
    * reply; the state only exists to drop re-deliveries, and
    * re-deliveries arrive within the delivery-retry horizon, not hours
    * later. With eviction on, the contract becomes the same as a
    * watermarked dropDuplicates — a re-delivery INSIDE the retention
    * window is dropped exactly; one arriving after eviction is RE-SERVED
    * (at-least-once output, never loss). `ServeEvictionSpec` pins both
    * halves (state rows drop to zero; post-eviction re-delivery serves
    * again).
    *
    * Why opt-in rather than always-on: Spark runs a
    * `flatMapGroupsWithState` with `ProcessingTimeTimeout`
    * unconditionally batch-after-batch (`FlatMapGroupsWithStateExec
    * .shouldRunAnotherBatch` is `true` whenever processing-time timeouts
    * are enabled), so such a query never quiesces —
    * `processAllAvailable()` blocks forever and a no-trigger query
    * busy-loops empty batches. A PRODUCTION serving tier (continuous,
    * with a processing-time trigger) should pass
    * `Some(ServedStateRetention)`; drain-style runs (batch-parity
    * replays, bounded probe sets) keep the `None` default and accept
    * state ∝ distinct probes served.
    */
  val ServedStateRetention: String = "10 minutes"

  /** One served neighbor — identical shape and arithmetic to the batch
    * `ann_pq_topk` output rows (probe, rank, neighbor, cos rounded to
    * 6 decimals, rank ordered cos desc / neighbor asc).
    */
  final case class ServeResult(probe: Long, rank: Int, neighbor: Long, cos: Double)

  /** Sequential left-fold double dot — [[graft.functions.FloatDot]]'s
    * exact summation order, the arithmetic contract every distance in
    * this file shares with the batch engine and the oracle.
    */
  private def dotFF(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** dot(pe[off ..< off+b.length], b) — the batch `slice` + `zip_with`
    * fold for the subspace and centroid terms.
    */
  private def dotFD(a: Array[Float], off: Int, b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < b.length) { acc += a(off + i).toDouble * b(i); i += 1 }
    acc
  }

  /** The batch probe-cell selection, replicated per record: squared-L2
    * to every trained centroid (sequential double fold — the
    * centroidDists order), top-nprobe by (d asc, clabel asc) — the
    * `GroupedTopK(-d, clabel)` tie contract.
    */
  def probedCells(emb: Array[Float], centroids: Array[(Long, Array[Double])],
      nprobe: Int): Array[Long] =
    centroids.map { case (label, cv) =>
      var acc = 0.0
      var i = 0
      while (i < cv.length) {
        val diff = emb(i).toDouble - cv(i)
        acc += diff * diff
        i += 1
      }
      (acc, label)
    }.sortBy(identity).take(nprobe).map(_._2)

  private def serveGroup(
      centroidOf: Map[Long, Array[Double]],
      codebook: Array[Array[Array[Double]]],
      shortlist: Int, k: Int,
      retention: Option[String])(
      probe: Long,
      rows: Iterator[(QueryEvent, IndexRow)],
      state: GroupState[ServeState]): Iterator[ServeResult] = {
    if (state.hasTimedOut) { // retention elapsed: evict the served probe
      state.remove()
      return Iterator.empty
    }
    var st = state.getOption.getOrElse(ServeState(Map.empty))
    val all = rows.toSeq
    val fresh = all.filter { case (q, _) =>
      q.seq > st.lastSeq.getOrElse(q.src, Long.MinValue) }
    if (fresh.isEmpty) {
      // pure re-delivery batch: keep the dedup state alive one more
      // retention window (the timeout is cleared on every invocation —
      // it must be re-armed each call or the state lives forever)
      retention.foreach(r => if (state.exists) state.setTimeoutDuration(r))
      return Iterator.empty
    }
    fresh.map(_._1).distinct.foreach { q =>
      if (q.seq > st.lastSeq.getOrElse(q.src, Long.MinValue))
        st = ServeState(st.lastSeq + (q.src -> q.seq))
    }
    state.update(st)
    retention.foreach(state.setTimeoutDuration)
    // every delivery of one probe carries the same payload AND knobs
    // (the [[QueryEvent]] contract: probe = one logical query) and
    // joins the same candidate rows — serve once, from one delivery's
    // rows, picked DETERMINISTICALLY (min (seq, src), matching
    // pqServePruned) so a contract-violating mixed-knob batch at least
    // serves a stable winner instead of a batch-order-dependent one
    val q0 = fresh.map(_._1).minBy(q => (q.seq, q.src))
    val cands = fresh.collect {
      case (q, ix) if q.src == q0.src && q.seq == q0.seq => ix }
    score(q0, cands, centroidOf, codebook,
      if (q0.shortlist > 0) q0.shortlist else shortlist, k)
  }

  /** The per-query scoring core shared by both serving forms: ADC
    * approximate inner product from the task-local codebook, bounded
    * shortlist by (approx desc, id asc), full-precision rescore of the
    * shortlist alone, top-k by (cos desc, id asc) with HALF_UP
    * 6-decimal rounding — bit-for-bit the batch `ann_pq_topk`
    * arithmetic (same folds, same tie-breaks, same rounding).
    */
  private def score(
      q: QueryEvent,
      cands: Seq[IndexRow],
      centroidOf: Map[Long, Array[Double]],
      codebook: Array[Array[Array[Double]]],
      shortlist: Int, k: Int): Iterator[ServeResult] = {
    val pe = q.embedding
    val pn = dotFF(pe, pe)
    val m = codebook.length
    val h = pe.length / m
    // per-(subspace, code) ADC lookup table for THIS query — the batch
    // `td` broadcast, computed once: M × K ≤ 2048 sub-dots
    val sd = Array.tabulate(m) { mi =>
      val book = codebook(mi)
      Array.tabulate(book.length) { c =>
        if (book(c) == null) Double.NaN else dotFD(pe, mi * h, book(c))
      }
    }
    // base term per probed cell: dot(query, centroid) — the batch `bq`
    val bq = scala.collection.mutable.Map.empty[Long, Double]
    val scored = cands.map { ix =>
      val b = bq.getOrElseUpdate(ix.cell, dotFD(pe, 0, centroidOf(ix.cell)))
      var sdsum = 0.0
      var mi = 0
      while (mi < m) { sdsum += sd(mi)(ix.codes(mi)); mi += 1 }
      (ix, (b + sdsum) / math.sqrt(pn * ix.norm2))
    }
    // shortlist by (approx desc, vec_id asc), then full-precision
    // rescore of those alone — the two-stage batch contract
    val top = scored.sortBy { case (ix, a) => (-a, ix.vec_id) }.take(shortlist)
      .map { case (ix, _) =>
        (ix.vec_id, dotFF(pe, ix.embedding) / math.sqrt(pn * ix.norm2)) }
      .sortBy { case (id, cos) => (-cos, id) }.take(k)
    top.iterator.zipWithIndex.map { case ((id, cos), r) =>
      ServeResult(q.probe, r + 1, id,
        java.math.BigDecimal.valueOf(cos)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
    }
  }

  /** Online IVF-PQ top-k serving: a STREAM of query vectors answered
    * against the STATIC staged index — the query side of the production
    * vector store, completing the twin pair with [[pqIngest]] (the
    * write side). Per micro-batch: each query picks its nprobe trained
    * cells in-record, a stream-static equi-join on `cell` fetches the
    * candidate index rows, and the per-probe state machine scores them
    * through [[score]]. The `nprobe`/`shortlist` parameters are the
    * TIER defaults; a request that carries its own positive
    * [[QueryEvent.nprobe]]/[[QueryEvent.shortlist]] overrides them for
    * that query alone (per-request recall purchase — the ceiling
    * ladder's lever). State is O(probes × sources) dedup high-waters;
    * centroids + codebook ride along task-local (broadcast-scale, the
    * batch pass ships the same tables). `AnnServeSpec` pins exact batch
    * parity on the real gate corpus.
    *
    * SCALE LIMIT, measured (`ScaleProbe serve`, SCALING.md round 11):
    * the static side of a continuous stream-static join is planned
    * ONCE — Spark has no dynamic partition pruning for streaming
    * queries, so every micro-batch re-reads the full index regardless
    * of on-disk layout, and per-batch latency grows with the corpus.
    * This form is right for an index that fits a broadcast or for
    * high-fanout batches that touch most cells; the corpus-scale form
    * is [[pqServePruned]], where each batch's probed cells become
    * LITERAL partition filters.
    */
  def pqServe(
      queries: Dataset[QueryEvent],
      index: Dataset[IndexRow],
      centroids: Array[(Long, Array[Double])],
      codebook: Array[Array[Array[Double]]],
      nprobe: Int,
      shortlist: Int,
      k: Int = 5,
      stateRetention: Option[String] = None): Dataset[ServeResult] = {
    import queries.sparkSession.implicits._
    val timeoutConf = stateRetention
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout)
      .getOrElse(GroupStateTimeout.NoTimeout)
    val probed = queries.flatMap(q =>
      probedCells(q.embedding, centroids,
        if (q.nprobe > 0) q.nprobe else nprobe).map(c => (c, q)))
    probed.joinWith(index, probed("_1") === index("cell"))
      .filter(t => t._2.vec_id != t._1._2.probe)
      .map { case ((_, q), ix) => (q, ix) }
      .groupByKey(_._1.probe)
      .flatMapGroupsWithState[ServeState, ServeResult](
        OutputMode.Update, timeoutConf)(
        serveGroup(centroids.toMap, codebook, shortlist, k, stateRetention))
  }

  /** The deduped query stream shared by [[pqServePruned]]: one
    * QueryEvent per probe per micro-batch, re-deliveries dropped by the
    * per-probe high-water state — the same at-least-once contract as
    * [[pqServe]], applied BEFORE the index is touched.
    */
  private def dedupedQueries(
      queries: Dataset[QueryEvent],
      retention: Option[String]): Dataset[QueryEvent] = {
    import queries.sparkSession.implicits._
    val timeoutConf = retention
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout)
      .getOrElse(GroupStateTimeout.NoTimeout)
    queries.groupByKey(_.probe)
      .flatMapGroupsWithState[ServeState, QueryEvent](
        OutputMode.Update, timeoutConf) {
        (_: Long, evs: Iterator[QueryEvent], state: GroupState[ServeState]) =>
          if (state.hasTimedOut) { // retention elapsed: evict
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(ServeState(Map.empty))
            val fresh = evs.toSeq.filter(q =>
              q.seq > st.lastSeq.getOrElse(q.src, Long.MinValue))
            if (fresh.isEmpty) {
              retention.foreach(r => if (state.exists) state.setTimeoutDuration(r))
              Iterator.empty
            } else {
              fresh.foreach { q =>
                if (q.seq > st.lastSeq.getOrElse(q.src, Long.MinValue))
                  st = ServeState(st.lastSeq + (q.src -> q.seq))
              }
              state.update(st)
              retention.foreach(state.setTimeoutDuration)
              Iterator.single(fresh.minBy(q => (q.seq, q.src)))
            }
          }
      }
  }

  /** Corpus-scale serving: the deduped query batch's probed cells
    * become LITERAL partition filters on a CELL-PARTITIONED on-disk
    * index (written by [[graft.queries.Similarity.writeServingIndex]]),
    * so each micro-batch reads candidates ∝ batch · nprobe · n/nlist —
    * never the corpus. A continuous stream-static join cannot plan
    * this (no dynamic partition pruning in streaming); foreachBatch
    * CAN, because the batch side is driver-visible when the per-batch
    * plan is built: collect the (bounded, request-sized) query batch,
    * push `cell IN (probed)` into the parquet scan, fan candidates to
    * their probes with a task-local cell→probes map, group per probe,
    * and run the SAME [[score]] core. Candidate shuffle is
    * O(batch · nprobe · n/nlist); results append to `sink` per batch.
    * Start it like any foreachBatch query:
    * `pqServePruned(...).option("checkpointLocation", c).start()`.
    */
  def pqServePruned(
      queries: Dataset[QueryEvent],
      indexPath: String,
      centroids: Array[(Long, Array[Double])],
      codebook: Array[Array[Array[Double]]],
      nprobe: Int,
      shortlist: Int,
      k: Int = 5,
      stateRetention: Option[String] = None)(
      sink: Dataset[ServeResult] => Unit): org.apache.spark.sql.streaming.DataStreamWriter[QueryEvent] = {
    val centroidOf = centroids.toMap
    val fn: (Dataset[QueryEvent], Long) => Unit = { (batch, _) =>
      val qs = batch.collect()
      if (qs.nonEmpty)
        sink(servePrunedBatch(batch.sparkSession, qs, indexPath, centroids,
          centroidOf, codebook, nprobe, shortlist, k))
    }
    dedupedQueries(queries, stateRetention).writeStream.foreachBatch(fn)
      .outputMode(OutputMode.Update())
  }

  /** The per-micro-batch core of the pruned serving form, shared by
    * [[pqServePruned]] (fixed artifacts) and [[pqServeLatest]]
    * (per-batch generation resolution). The query batch is the request
    * side — bounded by construction (a serving tier answers requests in
    * bounded batches); collecting it is what lets the per-batch plan
    * carry literal cell filters.
    */
  private[streaming] def servePrunedBatch(
      s: SparkSession,
      qs: Array[QueryEvent],
      indexPath: String,
      centroids: Array[(Long, Array[Double])],
      centroidOf: Map[Long, Array[Double]],
      codebook: Array[Array[Array[Double]]],
      nprobe: Int,
      shortlist: Int,
      k: Int): Dataset[ServeResult] = {
    import s.implicits._
    val cellProbes: Map[Long, Array[(Long, Array[Float])]] = qs
      .flatMap(q => probedCells(q.embedding, centroids,
          if (q.nprobe > 0) q.nprobe else nprobe)
        .map(c => (c, (q.probe, q.embedding))))
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
    val qMap: Map[Long, QueryEvent] = qs.map(q => q.probe -> q).toMap
    val cells = cellProbes.keys.toSeq.sorted
    val idx = s.read.parquet(indexPath)
    // literal type matched to the INFERRED partition-column type
    // (hive-style partition dirs read back as INT when values fit) —
    // a type-exact IN list keeps the filter a clean partition-prune,
    // with no cast wrapped around the partition attribute
    val inList: Seq[Any] =
      if (idx.schema("cell").dataType == org.apache.spark.sql.types.IntegerType)
        cells.map(_.toInt)
      else cells
    val cand = idx
      .where(col("cell").isin(inList: _*))
      .select($"vec_id", $"cell".cast("long").as("cell"), $"norm2",
        $"codes", $"embedding")
      .as[IndexRow]
    cand
      .flatMap(ix => cellProbes.getOrElse(ix.cell, Array.empty)
        .collect { case (p, _) if p != ix.vec_id => (p, ix) })
      .groupByKey(_._1)
      .flatMapGroups { (probe: Long, it: Iterator[(Long, IndexRow)]) =>
        val q = qMap(probe)
        score(q, it.map(_._2).toSeq, centroidOf, codebook,
          if (q.shortlist > 0) q.shortlist else shortlist, k)
      }
  }

  /** The pruned serving form bound to a GENERATION ROOT instead of a
    * fixed artifact set: each micro-batch resolves the `_latest`
    * pointer ([[graft.queries.Similarity.writeServingGeneration]]'s
    * commit point) and — only when the generation number changed —
    * reloads the index path, centroids, and codebook from the new
    * generation directory. This is LIVE retrain cutover: the
    * drift-trigger loop trains a new quantizer, writes gen-N+1, flips
    * the pointer, and the serving query answers its next batch under
    * the new generation with no restart (AnnServeSpec pins per-batch
    * parity against the batch engine on each side of a mid-stream
    * flip). Rollback is the same mechanism pointed backwards. The
    * probe dedup state spans generations deliberately — a probe
    * answered under gen N is not re-answered under N+1 (one logical
    * query, one answer; re-query under the new generation is a new
    * probe).
    */
  def pqServeLatest(
      queries: Dataset[QueryEvent],
      root: String,
      nprobe: Int,
      shortlist: Int,
      k: Int = 5,
      stateRetention: Option[String] = None)(
      sink: Dataset[ServeResult] => Unit): org.apache.spark.sql.streaming.DataStreamWriter[QueryEvent] = {
    var cached: Option[graft.queries.Similarity.ServingGeneration] = None
    var cachedMap: Map[Long, Array[Double]] = Map.empty
    val fn: (Dataset[QueryEvent], Long) => Unit = { (batch, _) =>
      val s = batch.sparkSession
      val qs = batch.collect()
      if (qs.nonEmpty) {
        // a vanished pointer is an ERROR, not license to keep serving a
        // stale cached generation — same contract as the never-loaded case
        val latest = graft.queries.Similarity.latestServingGeneration(root)
          .getOrElse(sys.error(s"$root: no committed serving generation"))
        if (!cached.map(_.gen).contains(latest)) {
          cached = Some(graft.queries.Similarity.loadServingGeneration(s, root))
          cachedMap = cached.get.centroids.toMap
        }
        val g = cached.get
        sink(servePrunedBatch(s, qs, g.indexPath, g.centroids, cachedMap,
          g.codebook, nprobe, shortlist, k))
      }
    }
    dedupedQueries(queries, stateRetention).writeStream.foreachBatch(fn)
      .outputMode(OutputMode.Update())
  }
}
