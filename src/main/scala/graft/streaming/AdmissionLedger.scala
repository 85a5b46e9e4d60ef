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
  * committed epoch id, the INCARNATION that committed it (the
  * streaming query's id — stable across checkpoint resumes, fresh for
  * a new checkpoint), the cumulative counters BEFORE that epoch
  * (`pre`), and the cumulative counters AFTER it (`post`).
  *
  * Recovery rule for an arriving epoch E under incarnation I
  * ([[recover]]):
  *  - no file → empty state (first campaign batch ever);
  *  - recorded (incarnation, epoch) == (I, E) → E is a REPLAY (a
  *    foreachBatch retry in this run, or a checkpoint RESUME re-running
  *    the last uncommitted epoch — a resume keeps the query id) → `pre`:
  *    the replay reads exactly the state the original attempt saw, so
  *    nothing double-counts;
  *  - recorded incarnation != I → a NEW campaign incarnation (fresh
  *    checkpoint, fresh query id) continuing the campaign → `post`:
  *    admission is cumulative across restarts by contract — a restart
  *    must never re-open a spent budget. This is what disambiguates the
  *    (dir, epoch)-only format's one blind corner: a fresh-checkpoint
  *    restart arriving at epoch 0 when the previous incarnation
  *    committed exactly one epoch numbered 0 is a CONTINUATION (post),
  *    not a replay — the query ids differ, so the ledger can tell;
  *  - same incarnation, any other epoch → `post` (the next epoch of a
  *    running query re-recovering, e.g. after a transient foreachBatch
  *    failure).
  *
  * A pre-incarnation state file (no `run` line) falls back to the old
  * epoch-equality rule, so an in-flight campaign upgrades in place.
  */
object AdmissionLedger {

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  private final case class State(
      run: Option[String], epoch: Long,
      pre: Map[String, Long], post: Map[String, Long])

  private def read(dir: String): Option[State] = {
    val f = Paths.get(dir, "state.tsv")
    if (!Files.exists(f)) None
    else {
      val lines = Files.readAllLines(f).asScala.filter(_.nonEmpty)
      val epoch = lines.head.stripPrefix("epoch\t").toLong
      val run = lines.tail.collectFirst {
        case l if l.startsWith("run\t") => dec(l.stripPrefix("run\t"))
      }
      def side(tag: String): Map[String, Long] = lines.tail
        .map(_.split('\t'))
        .collect { case Array(`tag`, src, n) => dec(src) -> n.toLong }
        .toMap
      Some(State(run, epoch, side("P"), side("C")))
    }
  }

  /** The cumulative pre-state epoch `epoch` under incarnation
    * `incarnation` must start from — see the recovery rule above. */
  def recover(dir: String, incarnation: String, epoch: Long): Map[String, Long] =
    read(dir) match {
      case None => Map.empty
      case Some(st) => st.run match {
        case Some(r) =>
          if (r == incarnation && st.epoch == epoch) st.pre else st.post
        case None => // legacy format: epoch equality is all we have
          if (st.epoch == epoch) st.pre else st.post
      }
    }

  /** Atomically commit epoch `epoch`'s state transition under
    * incarnation `incarnation`: `pre` is the cumulative counters the
    * epoch started from, `post` what they are after its admissions. */
  def commit(dir: String, incarnation: String, epoch: Long,
      pre: Map[String, Long], post: Map[String, Long]): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val tmp = d.resolve(".state.tmp")
    val body = new StringBuilder(s"epoch\t$epoch")
    body.append('\n').append("run\t").append(enc(incarnation))
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
