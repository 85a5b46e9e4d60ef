package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.GraphRank

/** Streaming rank-gated ADMISSION — the ingest-side twin of
  * `gr_rank_sample`: a continuous stream of (doc_id, source) arrivals
  * is admitted against the committed rank-proportional per-source
  * budgets ([[GraphRank]]'s gate), so a live ingest enforces the same
  * domain-weighted mix the batch sampler draws.
  *
  * State is ONE counter per source (admitted-so-far) — bounded by the
  * source vocabulary, never the stream; budgets ship as a broadcast
  * variable (sources-sized, the NbScoreStream model-shipping pattern).
  * Within each micro-batch a source's arrivals are admitted in the
  * md5-draw order (the family's canonical tie-break), so the stream's
  * decisions are deterministic given the batch sequence — and a feed
  * in global md5 order reproduces the batch sampler's selection
  * EXACTLY (GateStreamSpec pins set equality with gr_rank_sample).
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
          // group sizes are batch-bounded, so the sort is local and small
          val take = rows.toSeq.sortBy(a => (a.draw, a.doc_id))
            .take(room.toInt)
          state.update(SourceCount(already + take.size))
          take.iterator.map(a => Admitted(a.doc_id, a.source))
      }
  }
}
