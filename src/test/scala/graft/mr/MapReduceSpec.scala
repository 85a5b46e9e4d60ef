package graft.mr

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.core.KV
import graft.io.TextCorpus

/** Golden-output differential tests: distributed engine vs the sequential
  * oracle on the fixture corpus — mirrors the reference's test-mr.sh
  * (`sort mr-out* | cmp - golden`, order-insensitive, byte-exact lines).
  */
class MapReduceSpec extends SparkSpec {

  private lazy val corpusDir = resource("corpus")

  /** Oracle-side input: read files directly, independent of Spark. */
  private lazy val files: Seq[(String, String)] =
    Files.list(Paths.get(corpusDir)).iterator().asScala.toSeq
      .sortBy(_.getFileName.toString)
      .map(p => (p.getFileName.toString,
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))

  private def goldenDiff(
      mapF: (String, String) => Seq[KV],
      reduceF: (String, Seq[String]) => String): Unit = {
    val engine = TextCorpus.formatLines(
      MapReduce.run(TextCorpus.read(spark, corpusDir), mapF, reduceF))
      .collect().sorted.toSeq
    val oracle = Sequential.run(files, mapF, reduceF)
      .map(kv => s"${kv.key} ${kv.value}").sorted
    assert(engine === oracle)
  }

  test("corpus fixture is read whole-file with filename keys") {
    val got = TextCorpus.read(spark, corpusDir).collect().toMap
    assert(got.keySet === files.map(_._1).toSet.filter(f => files.toMap.apply(f).nonEmpty)
      || got.keySet === files.map(_._1).toSet)
    assert(got("pg-fox.txt").contains("quick brown fox"))
  }

  test("A1 word count: engine matches sequential oracle") {
    goldenDiff(Apps.WordCount.map, Apps.WordCount.reduce)
  }

  test("A2 inverted index: engine matches sequential oracle") {
    goldenDiff(Apps.InvertedIndex.map, Apps.InvertedIndex.reduce)
  }

  test("A4 file stats: engine matches sequential oracle") {
    goldenDiff(Apps.FileStats.map, Apps.FileStats.reduce)
  }

  test("word count output is exactly one record per distinct word") {
    val out = MapReduce.run(
      TextCorpus.read(spark, corpusDir), Apps.WordCount.map, Apps.WordCount.reduce)
      .collect()
    assert(out.map(_.key).distinct.length === out.length)
    val fox = out.find(_.key === "fox").get
    // fox appears: 2 in pg-fox, 1 in pg-cafe, 2 in pg-trailing
    assert(fox.value === "5")
  }

  test("inverted index postings are per-document distinct and sorted") {
    val out = MapReduce.run(
      TextCorpus.read(spark, corpusDir), Apps.InvertedIndex.map, Apps.InvertedIndex.reduce)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(out("fox") === "3 pg-cafe.txt,pg-fox.txt,pg-trailing.txt")
    // 'café' only in pg-cafe.txt — non-ASCII token survives
    assert(out("café") === "1 pg-cafe.txt")
  }
}

/** Tokenizer parity: Apps.tokenize (Character.isLetter) must agree with the
  * Go unicode.IsLetter semantics of mrapps/wc.go:23-26 and with the \p{L}
  * regex used by the DataFrame formulation.
  */
class TokenizerSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("unicode letters are kept, everything else splits") {
    assert(Apps.tokenize("The quick-brown_fox 42 jumps!") ===
      Seq("The", "quick", "brown", "fox", "jumps"))
    assert(Apps.tokenize("café 北京 Σωκράτης") === Seq("café", "北京", "Σωκράτης"))
    assert(Apps.tokenize("") === Seq.empty)
    assert(Apps.tokenize("123 456") === Seq.empty)
    assert(Apps.tokenize("a") === Seq("a"))
  }

  test("tokenize agrees with the \\p{L} split regex on mixed text") {
    val texts = Seq(
      "The quick brown fox; naïve café visits: 42 times!",
      "word-word word_word",
      "Σωκράτης said 北京 is\tfar\naway")
    for (t <- texts) {
      val viaRegex = t.split("[^\\p{L}]+").toSeq.filter(_.nonEmpty)
      assert(Apps.tokenize(t) === viaRegex, s"diverged on: $t")
    }
  }
}
