package graft.core

import scala.jdk.CollectionConverters._

/** Serving-generation bookkeeping shared by every generational artifact
  * store (the vector tier's `gen-N/{index, centroids, codebook}`, the
  * lexical tier's `gen-N/{index, bounds}`): monotone generation
  * numbers allocated from the DIRECTORIES (never from the pointer — a
  * rolled-back pointer + 1 would reuse a live number and poison readers
  * caching artifacts by gen), an atomic `_latest` pointer (temp +
  * ATOMIC_MOVE, the CorpusSink device), and keep-newest-K retention
  * that always preserves the pointer target.
  */
object Generations {

  /** Every gen-N directory under `root`, committed or not. */
  def existing(root: String): Seq[Long] = {
    val r = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.isDirectory(r)) Seq.empty
    else {
      val st = java.nio.file.Files.list(r)
      try st.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("gen-") => n.drop(4).toLongOption }
        .flatten.toSeq
      finally st.close()
    }
  }

  /** The next generation number: monotone over everything ever written
    * under `root`, rollback or not. */
  def next(root: String): Long = existing(root).maxOption.getOrElse(0L) + 1L

  /** Flip `_latest` atomically — the single commit point every
    * generation write shares. */
  def setLatest(root: String, gen: Long): Unit = {
    val tmp = java.nio.file.Paths.get(s"$root/_latest.tmp")
    java.nio.file.Files.createDirectories(tmp.getParent)
    java.nio.file.Files.writeString(tmp, gen.toString)
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$root/_latest"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** The generation `_latest` points at, if any committed. */
  def latest(root: String): Option[Long] = {
    val f = java.nio.file.Paths.get(s"$root/_latest")
    if (java.nio.file.Files.exists(f))
      java.nio.file.Files.readString(f).trim.toLongOption
    else None
  }

  /** Drop all but the newest `keep` generations (the committed pointer
    * target is always retained regardless). Run AFTER serving tiers
    * have had a batch under the new pointer — a tier mid-batch on a
    * pruned generation would lose files under its scan. Returns the
    * pruned gen numbers. */
  def prune(root: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "keep at least the current generation")
    val current = latest(root)
    val gens = existing(root).sorted
    val drop = gens.dropRight(keep).filterNot(current.contains)
    drop.foreach { g =>
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$root/gen-$g"))
    }
    drop
  }
}
