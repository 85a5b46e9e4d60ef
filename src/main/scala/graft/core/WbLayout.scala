package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory

/** The WORD-BUCKETED committed-artifact layout shared by the serving
  * generations whose probe unit is a term (the positional tier's
  * postings/capped/bigram slices, the lexical tier's impact/QL
  * indexes and bounds): rows partitioned into `wb = xxhash64(term)
  * mod NB` directory buckets and sorted by (term, …) within buckets,
  * with the modulus committed beside the artifact (the `wb_n`
  * sidecar — a reader must bucket probe terms with the WRITER's
  * modulus, never a guess).
  *
  * Why this layout exists (measured, SCALING.md r16): a serving
  * batch probes tens-to-hundreds of terms out of a vocabulary that
  * grows with the corpus (Heaps' law). A flat-parquet artifact makes
  * every probe join a full-index scan — the round-16 wide-vocabulary
  * ladder shows that form growing ~2.4×/decade — while this layout
  * turns the probe into a planning-time-pruned LOOKUP: the probed
  * terms' bucket ids prune non-probed `wb=` partition directories at
  * planning, and the terms themselves push to parquet as an In
  * predicate that prunes row groups inside the surviving buckets
  * (term-sorted layout → tight row-group stats). The served cost is
  * ~hit-buckets/NB of the index, flat across corpus decades.
  */
object WbLayout {

  private val log = LoggerFactory.getLogger(getClass)

  /** Rows per bucket target: ~0.5–1 MB parquet per bucket keeps the
    * probe's hit fraction 1−e^(−probed/NB) small at realistic batch
    * sizes — the prune IS the point, so buckets err small. */
  private val Chunk = 50000L

  /** Bucket count for an artifact of `nRows` — power of two, clamped
    * to [16, 4096]: small corpora get few directories (test-friendly),
    * and at 100 TB the cap bounds the file-count blowup while a
    * batch's probed terms still hit a small fraction of 4096 buckets. */
  def bucketsFor(nRows: Long): Int = {
    val target = math.max(1L, nRows / Chunk)
    val pow = java.lang.Long.highestOneBit(math.min(target, 1L << 20))
    math.min(4096, math.max(16, pow.toInt))
  }

  /** `df` with the `wb` bucket column, one shuffle partition per
    * bucket, term-sorted within — ready for
    * `.write.partitionBy("wb")`. */
  def bucketed(df: DataFrame, key: String, nb: Int,
      sortAlso: Seq[String] = Seq.empty): DataFrame = df
    .withColumn("wb", pmod(xxhash64(col(key)), lit(nb.toLong)).cast("int"))
    .repartition(col("wb"))
    .sortWithinPartitions(col("wb") +: col(key) +: sortAlso.map(col): _*)

  /** Commit the layout's modulus beside the artifact. */
  def writeSidecar(genDir: String, nb: Int): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$genDir/wb_n"), nb.toString)

  /** The committed modulus, or None for a pre-bucketing generation
    * (which loads and serves unchanged — no prune, same plans). */
  def readSidecar(genDir: String): Option[Int] = {
    val p = java.nio.file.Paths.get(s"$genDir/wb_n")
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.readString(p).trim.toIntOption
    else None
  }

  /** A batch's probed terms with their bucket ids under the writer's
    * modulus — collected once per serve call (queries × terms rows)
    * and reused across every slice the call prunes. The bucket ids
    * come from a Spark job over the probe frame so the hash is
    * Spark's own xxhash64, bit-identical to the writer's. */
  final case class Probe(terms: Seq[String], buckets: Set[Int]) {
    def isEmpty: Boolean = terms.isEmpty
  }

  /** Max distinct terms shipped in ONE literal In predicate. Two
    * cliffs live above this: spark.sql.parquet.pushdown
    * .inFilterThreshold (4096 — past it the In silently degrades to a
    * min/max range that prunes nothing) and, well below that, the
    * parquet-mr filter tree itself (an In pushes as an OR chain whose
    * evaluation recurses once per value — thousands of values overflow
    * the scan task's stack). A probe past this cap is CHUNKED: the
    * term set splits into ≤[[TermInMax]]-value groups, each filtered
    * in its own scan and unioned — every chunk keeps real row-group
    * pruning (the chunks are disjoint, so each scan prunes to its own
    * terms' row groups and the union is exact). Past
    * [[TermInMax]] × [[MaxInChunks]] terms the plan-size cost of more
    * scans stops paying and the term restriction degrades to a
    * broadcast semi-join over the bucket-pruned scan, logged so the
    * row-group-pruning loss is observable. */
  private val TermInMax = 1024
  private val MaxInChunks = 32

  def probeOf(probeTerms: DataFrame, key: String, nb: Int): Probe = {
    val rows = probeTerms
      .select(col(key),
        pmod(xxhash64(col(key)), lit(nb.toLong)).cast("int").as("wb"))
      .distinct().collect()
    val p = Probe(rows.map(_.getString(0)).toSeq,
      rows.map(r => Int.box(r.getInt(1)): Int).toSet)
    if (p.terms.size > TermInMax.toLong * MaxInChunks)
      log.warn(s"wb-layout probe has ${p.terms.size} distinct terms, past " +
        s"the ${TermInMax * MaxInChunks}-term chunked-In budget: keeping " +
        "the bucket prune but restricting terms by semi-join — row-group " +
        "pruning inside probed buckets is inactive for this batch; split " +
        "the batch to restore it")
    p
  }

  /** Restrict an artifact slice to the probe's terms: literal In
    * filters on (wb, term) when the slice carries the bucket column
    * (directory prune at planning + row-group prune at scan), term-In
    * only otherwise. Oversized probes chunk the In (see [[TermInMax]]);
    * genuinely huge ones degrade to a broadcast semi-join (scan-local,
    * stack-safe). An empty probe is an empty result, not a scan. */
  def prune(slice: DataFrame, key: String, probe: Probe): DataFrame = {
    def termFilter(df: DataFrame): DataFrame =
      if (probe.terms.size <= TermInMax)
        df.filter(col(key).isInCollection(probe.terms))
      else if (probe.terms.size <= TermInMax.toLong * MaxInChunks)
        probe.terms.grouped(TermInMax)
          .map(chunk => df.filter(col(key).isInCollection(chunk)))
          .reduce(_ unionByName _)
      else {
        val s = df.sparkSession
        import s.implicits._
        df.join(broadcast(probe.terms.toDF(key)), Seq(key), "left_semi")
      }
    if (probe.isEmpty) slice.filter(lit(false))
    else if (slice.columns.contains("wb"))
      termFilter(slice.filter(col("wb").isInCollection(probe.buckets)))
    else termFilter(slice)
  }

  /** [[prune]] when the modulus may be absent: the pre-bucketing
    * fallback applies `legacy` (the flat-layout probe restriction the
    * call sites already had — typically a broadcast semi-join or
    * identity). */
  def pruneOr(slice: DataFrame, key: String, probe: Option[Probe])(
      legacy: DataFrame => DataFrame): DataFrame =
    probe.map(prune(slice, key, _)).getOrElse(legacy(slice))
}
