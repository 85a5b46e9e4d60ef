package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Durable admission counters for [[GateStream.admittedLatest]] — the
  * gate's restart ledger.
  *
  * The generation-bound admission form keeps its per-source
  * admitted-so-far counters with the query (sources-sized driver
  * state) so budgets can be re-resolved per micro-batch. Driver state
  * dies with the query: without a ledger, a restarted admission stream
  * starts from zero and silently re-admits up to every budget — and a
  * foreachBatch RETRY of an epoch would double-count. This ledger is
  * ONE atomically-replaced state file (temp + rename, the
  * [[graft.core.Generations]] commit discipline) holding the last
  * committed epoch id, the cumulative counters BEFORE that epoch
  * (`pre`), and the cumulative counters AFTER it (`post`).
  *
  * Recovery rule for an arriving epoch E ([[recover]]):
  *  - no file → empty state (first campaign batch ever);
  *  - recorded epoch == E → E is a REPLAY (a retry in this run, or a
  *    checkpoint-resume re-running the last uncommitted batch) → `pre`:
  *    the replay reads exactly the state the original attempt saw, so
  *    nothing double-counts;
  *  - anything else → `post`: the next epoch of a resumed query, or a
  *    new incarnation continuing the campaign (admission is cumulative
  *    across restarts by contract — a restart must never re-open a
  *    spent budget).
  *
  * One corner is inherently unobservable from (dir, epoch) alone: a
  * FRESH-checkpoint restart whose previous incarnation committed
  * exactly one epoch numbered 0 collides with "replay of epoch 0" and
  * reads `pre`. Production restarts resume from the checkpoint (the
  * foreachBatch exactly-once contract), where epoch numbering is
  * monotone and the rule is exact; a fresh checkpoint with the SAME
  * ledger dir is a continuation campaign and should have run past
  * epoch 0.
  */
object AdmissionLedger {

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  private final case class State(
      epoch: Long, pre: Map[String, Long], post: Map[String, Long])

  private def read(dir: String): Option[State] = {
    val f = Paths.get(dir, "state.tsv")
    if (!Files.exists(f)) None
    else {
      val lines = Files.readAllLines(f).asScala.filter(_.nonEmpty)
      val epoch = lines.head.stripPrefix("epoch\t").toLong
      def side(tag: String): Map[String, Long] = lines.tail
        .map(_.split('\t'))
        .collect { case Array(`tag`, src, n) => dec(src) -> n.toLong }
        .toMap
      Some(State(epoch, side("P"), side("C")))
    }
  }

  /** The cumulative pre-state epoch `epoch` must start from — see the
    * recovery rule above. */
  def recover(dir: String, epoch: Long): Map[String, Long] =
    read(dir) match {
      case None => Map.empty
      case Some(st) if st.epoch == epoch => st.pre
      case Some(st) => st.post
    }

  /** Atomically commit epoch `epoch`'s state transition: `pre` is the
    * cumulative counters the epoch started from, `post` what they are
    * after its admissions. */
  def commit(dir: String, epoch: Long,
      pre: Map[String, Long], post: Map[String, Long]): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val tmp = d.resolve(".state.tmp")
    val body = new StringBuilder(s"epoch\t$epoch")
    pre.toSeq.sortBy(_._1).foreach { case (src, n) =>
      body.append('\n').append("P\t").append(enc(src)).append('\t').append(n)
    }
    post.toSeq.sortBy(_._1).foreach { case (src, n) =>
      body.append('\n').append("C\t").append(enc(src)).append('\t').append(n)
    }
    Files.writeString(tmp, body.toString)
    Files.move(tmp, d.resolve("state.tsv"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}
