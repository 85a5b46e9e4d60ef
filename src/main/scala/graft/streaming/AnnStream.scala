package graft.streaming

import org.apache.spark.sql.Dataset
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
}
