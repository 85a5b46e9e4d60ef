package graft.mr

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.KV
import graft.io.TextCorpus

/** Golden-output parity on the reference's REAL corpus — the 8 Project
  * Gutenberg books (~3.3 MB) its own test harness runs wc / indexer /
  * crash over (ref: main/test-mr.sh:33-67, :72-97, :155-203; corpus
  * main/pg-*.txt). The reference compares `sort mr-out*` of the
  * distributed engine byte-exactly against the sequential oracle
  * (main/test-mr.sh:59-67); here the distributed side is
  * [[MapReduce.run]] over [[TextCorpus.read]] and the oracle is
  * [[Sequential.run]] over driver-side file reads — sorted output lines
  * must match byte-for-byte, real tokenizer Unicode classes included.
  *
  * Cancels (rather than fails) if the reference corpus is absent, so the
  * suite stays runnable outside this environment.
  */
class RealCorpusSpec extends SparkSpec {

  private val corpusDir = "/root/reference/main"
  private val glob = "pg-*.txt"

  private lazy val files: Seq[(String, String)] = {
    val dir = Paths.get(corpusDir)
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("pg-") && p.toString.endsWith(".txt"))
      .toSeq.sortBy(_.getFileName.toString)
      .map(p => (p.getFileName.toString, new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
  }

  private def corpusAvailable: Boolean = files.nonEmpty

  private def sortedLines(kvs: Seq[KV]): Seq[String] =
    kvs.map(kv => s"${kv.key} ${kv.value}").sorted

  /** Run one app both ways and diff sorted lines — one test per app,
    * mirroring one `test-mr.sh` section each.
    */
  private def goldenDiff(
      name: String,
      mapF: (String, String) => Seq[KV],
      reduceF: (String, Seq[String]) => String): Unit = test(
    s"$name: distributed output == sequential oracle on the 8-book Gutenberg corpus") {
    assume(corpusAvailable, s"reference corpus not found at $corpusDir")
    import spark.implicits._

    val input = TextCorpus.read(spark, corpusDir, Some(glob))
    val distributed = MapReduce.run(input, mapF, reduceF).collect().toSeq
    val oracle = Sequential.run(files, mapF, reduceF)

    assert(files.size == 8, s"expected the 8 Gutenberg books, found ${files.size}")
    assert(oracle.nonEmpty)
    assert(sortedLines(distributed) == sortedLines(oracle))
  }

  goldenDiff("wc", Apps.WordCount.map, Apps.WordCount.reduce)
  goldenDiff("indexer", Apps.InvertedIndex.map, Apps.InvertedIndex.reduce)
  goldenDiff("filestats", Apps.FileStats.map, Apps.FileStats.reduce)

  test("DataFrame regex tokenizer == typed isLetter tokenizer on the real corpus") {
    assume(corpusAvailable, s"reference corpus not found at $corpusDir")
    import spark.implicits._
    // The DataFrame formulations (a1/a2, MrQueries) tokenize with the
    // Java regex class \p{L}; the typed engine uses Character.isLetter —
    // the one place SURVEY §7.4 flags byte-exact parity could break.
    // Certify their equivalence over every real-corpus character.
    val regexCounts = TextCorpus.read(spark, corpusDir, Some(glob)).toDF("file", "contents")
      .select(explode(split($"contents", "[^\\p{L}]+")).as("word"))
      .filter(length($"word") > 0)
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap

    val typedCounts = files.flatMap { case (_, c) => Apps.tokenize(c) }
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }

    assert(regexCounts.size == typedCounts.size)
    assert(regexCounts == typedCounts)
  }

  test("wc totals are consistent: sum of counts == total token occurrences") {
    assume(corpusAvailable, s"reference corpus not found at $corpusDir")
    val wc = Sequential.run(files, Apps.WordCount.map, Apps.WordCount.reduce)
    val totalFromWc = wc.map(_.value.toLong).sum
    val totalTokens = files.map { case (_, c) => Apps.tokenize(c).size.toLong }.sum
    assert(totalFromWc == totalTokens)
    assert(totalTokens > 500000L, s"corpus should have >500k tokens, got $totalTokens")
  }
}
