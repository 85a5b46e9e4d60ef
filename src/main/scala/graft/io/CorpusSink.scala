package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.{QueryFns, TextAnalysis}

/** Publish path for a curated corpus snapshot: the survivors of the
  * curation front end written as parquet PARTITIONED BY lang (the CCNet
  * release layout — each language ships as its own shard set), with an
  * order-independent manifest written LAST as the commit marker.
  *
  * Publish protocol (the E7/E4 sink discipline extended to the
  * pipeline): data files first — each file itself committed atomically
  * by Spark's FileCommitProtocol — then the manifest, recomputed FROM
  * THE WRITTEN FILES (it certifies what landed on disk, not what the
  * plan intended). A reader treats a snapshot without a manifest as
  * unpublished, so a crashed publish is never consumed half-written.
  * The manifest rows are exactly the oracle-checked
  * tx_curation_manifest result (CorpusSinkSpec pins the equality): per
  * lang, doc count, token count, and a COMMUTATIVE content checksum
  * (modular sum of 48-bit md5 prefixes mod 2^61-1,
  * [[graft.queries.QueryFns.checksumAgg]]) that any file/partition
  * layout of the same rows reproduces — at 100 TB validation is one scan of the
  * snapshot with a per-partition sum, no ordering or single-reducer
  * step anywhere.
  */
object CorpusSink {

  /** Write `dir`'s curated survivors under `outDir` and commit with a
    * manifest. `maxRecordsPerFile` bounds shard size (at 100 TB you
    * bound by records; Spark splits files accordingly).
    */
  def publish(s: SparkSession, dir: String, outDir: String,
      maxRecordsPerFile: Long = 1000000L): Unit = {
    // Manifest-last only commits correctly if no STALE manifest can
    // survive a crash mid-rewrite: when `outDir` already holds a
    // snapshot, retract it FIRST (delete `_manifest`), so a failure
    // between the data overwrite and the new manifest leaves the
    // directory unpublished rather than published-with-mismatched-data.
    // (publishVersioned never hits this — each generation dir is fresh.)
    val oldManifest = java.nio.file.Paths.get(s"$outDir/_manifest")
    if (java.nio.file.Files.exists(oldManifest))
      java.nio.file.Files.walk(oldManifest)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    Tables(s, dir).documents
      .join(TextAnalysis.curationSurvivors(s, dir).select(col("doc_id")), "doc_id")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("lang")
      .parquet(s"$outDir/data")
    manifestOf(s.read.parquet(s"$outDir/data"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/_manifest")
  }

  /** The manifest of any (doc_id, text, lang, ...) corpus frame: per
    * lang, (n_docs, n_tok, checksum) — the same derivation whether
    * computed from the pre-write frame, the written files, or by the
    * DuckDB oracle (tx_curation_manifest).
    */
  def manifestOf(df: DataFrame): DataFrame =
    df.select(col("lang"), QueryFns.hash48(col("text")).as("h"),
        size(QueryFns.wsTokens(col("text"))).cast("long").as("m"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("m")).as("n_tok"),
        QueryFns.checksumAgg(col("h")).as("checksum"))

  /** Versioned publish: each call lands a NEW immutable generation
    * under `outDir/gen=N` (data + manifest, the [[publish]] protocol),
    * then flips the `_latest` pointer to it LAST with an atomic rename.
    * Readers resolving through [[readLatest]] see either the previous
    * snapshot or the new one in full — never a mix — and
    * [[rollback]] is just pointing `_latest` back at an older, still
    * intact generation. Returns the new generation number.
    */
  def publishVersioned(s: SparkSession, dir: String, outDir: String): Long = {
    val next = latestGeneration(outDir).getOrElse(0L) + 1L
    publish(s, dir, s"$outDir/gen=$next")
    setLatest(outDir, next)
    next
  }

  /** The committed generation `_latest` points at, if any. */
  def latestGeneration(outDir: String): Option[Long] = {
    val f = java.nio.file.Paths.get(s"$outDir/_latest")
    if (java.nio.file.Files.exists(f))
      java.nio.file.Files.readString(f).trim.toLongOption
    else None
  }

  /** The current snapshot's data frame (fails if nothing is published). */
  def readLatest(s: SparkSession, outDir: String): DataFrame = {
    val gen = latestGeneration(outDir).getOrElse(
      sys.error(s"$outDir: no published generation"))
    s.read.parquet(s"$outDir/gen=$gen/data")
  }

  /** Point `_latest` back at `gen` (which must still be a committed,
    * valid snapshot — rollback to a pruned or torn generation is an
    * error, not a silent pointer flip).
    */
  def rollback(s: SparkSession, outDir: String, gen: Long): Unit = {
    val problems = validate(s, s"$outDir/gen=$gen")
    require(problems.isEmpty, s"rollback target gen=$gen invalid: $problems")
    setLatest(outDir, gen)
  }

  private def setLatest(outDir: String, gen: Long): Unit = {
    val tmp = java.nio.file.Paths.get(s"$outDir/_latest.tmp")
    java.nio.file.Files.createDirectories(tmp.getParent)
    java.nio.file.Files.writeString(tmp, gen.toString)
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$outDir/_latest"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** True iff `outDir` holds a committed snapshot (manifest present). */
  def isPublished(s: SparkSession, outDir: String): Boolean =
    new java.io.File(s"$outDir/_manifest").exists() &&
      new java.io.File(s"$outDir/data").exists()

  /** Re-derive the manifest from the on-disk data files and compare to
    * the committed manifest. Returns per-lang mismatch descriptions —
    * empty means the snapshot validates. A missing manifest is a
    * (single) mismatch, not an exception: callers poll this.
    */
  def validate(s: SparkSession, outDir: String): Seq[String] = {
    if (!isPublished(s, outDir)) return Seq(s"$outDir: no committed manifest")
    def keyed(df: DataFrame): Map[String, (Long, Long, Long)] =
      df.collect().map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tok"),
          r.getAs[Long]("checksum")))).toMap
    val committed = keyed(s.read.parquet(s"$outDir/_manifest"))
    val actual = keyed(manifestOf(s.read.parquet(s"$outDir/data")))
    val langs = (committed.keySet ++ actual.keySet).toSeq.sorted
    langs.flatMap { l =>
      (committed.get(l), actual.get(l)) match {
        case (Some(c), Some(a)) if c == a => None
        case (c, a) => Some(s"lang=$l: manifest=$c data=$a")
      }
    }
  }
}
