package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

import graft.queries.GraphRank

/** Streaming rank-gated ADMISSION — the ingest-side twin of
  * `gr_rank_sample`: a continuous stream of (doc_id, source) arrivals
  * is admitted against the committed rank-proportional per-source
  * budgets ([[GraphRank]]'s gate), so a live ingest enforces the same
  * domain-weighted mix the batch sampler draws.
  *
  * State is ONE counter per source (admitted-so-far) — bounded by the
  * source vocabulary, never the stream. Within each micro-batch a
  * source's arrivals are admitted in the md5-draw order (the family's
  * canonical tie-break), so the stream's decisions are deterministic
  * given the batch sequence — and a feed in global md5 order
  * reproduces the batch sampler's selection EXACTLY (GateStreamSpec
  * pins set equality with gr_rank_sample).
  *
  * Two forms: [[admitted]] binds the budgets ONCE from the session
  * corpus (a fixed-campaign ingest); [[admittedLatest]] binds them to
  * a committed generation root and re-resolves the `_latest` pointer
  * per micro-batch (the [[Bm25Stream.serveLatest]] device), so a rank
  * republish — mirror takedown, retrained centrality — re-shapes
  * admission on the very next batch with no query restart. The gate
  * is the one component whose staleness silently mis-shapes the
  * ingested corpus, so it gets the same live-cutover loop as every
  * serving tier.
  */
object GateStream {

  final case class Arrival(doc_id: Long, source: String, draw: String)
  final case class Admitted(doc_id: Long, source: String)
  final case class SourceCount(admitted: Long)

  /** Admit arrivals against `dir`'s committed budgets; emits admitted
    * (doc_id, source) rows in Update mode.
    */
  def admitted(arrivals: DataFrame, s: SparkSession, dir: String): Dataset[Admitted] = {
    import s.implicits._
    val budgets = s.sparkContext.broadcast(
      GraphRank.rankGate(s, dir)
        .select($"source", $"budget")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    val typed = arrivals
      .select($"doc_id", $"source",
        org.apache.spark.sql.functions.md5($"doc_id".cast("string")).as("draw"))
      .as[Arrival]
    typed.groupByKey(_.source)
      .flatMapGroupsWithState[SourceCount, Admitted](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (source, rows, state: GroupState[SourceCount]) =>
          val budget = budgets.value.getOrElse(source, 0L)
          val already = state.getOption.map(_.admitted).getOrElse(0L)
          val room = math.max(0L, budget - already)
          // canonical per-batch order: the md5 draw, ties to doc_id —
          // group sizes are batch-bounded, so the sort is local and small.
          // room is clamped before the Int conversion: a budget past
          // Int.MaxValue (the dominant-source case at 100 TB) would wrap
          // negative and silently admit ZERO docs from the biggest source
          val take = rows.toSeq.sortBy(a => (a.draw, a.doc_id))
            .take(math.min(room, Int.MaxValue.toLong).toInt)
          state.update(SourceCount(already + take.size))
          take.iterator.map(a => Admitted(a.doc_id, a.source))
      }
  }

  /** GENERATION-BOUND admission: budgets come from the committed
    * rank-gate generation under `root`
    * ([[GraphRank.writeGateGeneration]]'s `gen-N/budgets` + `_latest`
    * pointer), re-resolved EVERY micro-batch and reloaded only when the
    * generation number changed — live cutover / rollback by pointer,
    * identical to the lexical/vector/positional serving tiers. A
    * vanished pointer is an error, never license to keep admitting
    * against stale cached budgets.
    *
    * Admission semantics are [[admitted]]'s exactly (per-source
    * md5-order take against remaining room; one cumulative counter per
    * source), so a feed in canonical order under the corpus's own gate
    * generation reproduces gr_rank_sample. Counters PERSIST across
    * generations: admission is cumulative — a lowered budget stops
    * further admits, it does not revoke already-admitted docs; a
    * raised budget opens exactly the difference. foreachBatch form:
    * the counters live with the query (sources-sized driver state, the
    * same bound as the flatMapGroupsWithState store), which is what
    * lets the budget frame be re-resolved per batch; within the batch
    * the rank/join/filter work is fully distributed (one
    * source-partitioned window over the batch + one broadcast join
    * against the sources-sized room frame), and all room arithmetic is
    * Long — no Int clamp anywhere on this path.
    *
    * RESTART SAFETY: driver state dies with the query, so the
    * cumulative counters are additionally committed per epoch to
    * `ledger` ([[AdmissionLedger]]) AFTER the sink call, and the
    * pre-batch state is recovered from the newest entry BEFORE the
    * live epoch — on first batch after a (re)start, and on any
    * replayed epoch (a foreachBatch retry re-reads exactly the state
    * the failed attempt saw, so nothing double-counts and nothing
    * re-opens a spent budget). The sink itself must be idempotent by
    * epoch, the standard foreachBatch exactly-once contract.
    */
  def admittedLatest(arrivals: DataFrame, root: String, ledger: String)(
      sink: Dataset[Admitted] => Unit): DataStreamWriter[Row] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    var cached: Option[(Long, Map[String, Long])] = None
    // cumulative admissions through all epochs <= lastApplied;
    // Long.MinValue = not yet recovered from the ledger
    var lastApplied: Long = Long.MinValue
    val soFar = scala.collection.mutable.Map.empty[String, Long]
    // the ledger's incarnation id: the streaming query's id (stable
    // across checkpoint RESUMES — a resumed replay of an uncommitted
    // epoch reads pre — and fresh for a NEW checkpoint, so a restarted
    // campaign arriving at epoch 0 reads post even when the previous
    // incarnation committed exactly epoch 0). The UUID fallback covers
    // callers driving the batch fn outside a streaming query.
    val fallbackNonce = java.util.UUID.randomUUID().toString
    val fn: (DataFrame, Long) => Unit = { (batch, epoch) =>
      val incarnation = Option(batch.sparkSession.sparkContext
        .getLocalProperty("sql.streaming.queryId")).getOrElse(fallbackNonce)
      if (lastApplied == Long.MinValue || epoch <= lastApplied) {
        // (re)start or replayed epoch: recover the pre-batch state this
        // epoch must see — one sources-sized file read, never a guess
        soFar.clear()
        soFar ++= AdmissionLedger.recover(ledger, incarnation, epoch)
        lastApplied = epoch - 1
      }
      if (!batch.isEmpty) {
        val s = batch.sparkSession
        import s.implicits._
        val latest = graft.core.Generations.latest(root).getOrElse(
          sys.error(s"$root: no committed rank-gate generation"))
        if (!cached.map(_._1).contains(latest))
          cached = Some((latest,
            s.read.parquet(s"$root/gen-$latest/budgets")
              .select($"source", $"budget")
              .collect().map(r => r.getString(0) -> r.getLong(1)).toMap))
        val room = cached.get._2.toSeq.map { case (src, budget) =>
          (src, math.max(0L, budget - soFar.getOrElse(src, 0L)))
        }.toDF("source", "room")
        val w = Window.partitionBy($"source").orderBy($"draw", $"doc_id")
        val adm = batch
          .select($"doc_id".cast("long").as("doc_id"), $"source",
            md5($"doc_id".cast("string")).as("draw"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .join(broadcast(room), Seq("source")) // absent source = no budget
          .filter($"rn" <= $"room")
          .select($"doc_id", $"source").as[Admitted]
          .persist()
        try {
          val delta = adm.groupBy($"source").agg(count(lit(1)).as("n"))
            .collect().map(r => r.getString(0) -> r.getLong(1))
          sink(adm)
          // counters move only AFTER sink + ledger commit succeeded —
          // a failure at any point leaves soFar at the pre-state, so
          // the epoch's retry recomputes the same admissions from the
          // same state (and a committed-but-failed-after entry is
          // simply overwritten with identical content)
          val pre = soFar.toMap
          val cum = delta.foldLeft(pre) { case (m, (src, n)) =>
            m.updated(src, m.getOrElse(src, 0L) + n)
          }
          AdmissionLedger.commit(ledger, incarnation, epoch, pre, cum)
          soFar.clear(); soFar ++= cum
        } finally adm.unpersist(blocking = false)
      }
      lastApplied = epoch
    }
    arrivals.writeStream.foreachBatch(fn).outputMode(OutputMode.Update())
  }
}
