package graft.queries

import java.security.MessageDigest

import scala.util.Random

import graft.SparkSpec

/** Property check for the MinHash banding machinery against an
  * independent in-memory brute force: random corpora including docs
  * with <3 tokens (no shingles — must be absent), docs of exactly 3
  * tokens (one shingle), repeated-shingle docs, and a >MaxDf common
  * phrase planted across >100 docs so the stop-shingle guard genuinely
  * ACTIVATES (the gate corpora never trigger it — DuckDB-checked empty
  * at every SF). Both Spark formulations — the staged groupBy band
  * index and the per-row array route the streaming twin rides — must
  * equal the brute force exactly. The DuckDB oracle pins the fixed
  * corpora; this pins the SEMANTICS against a third, structurally
  * different implementation.
  */
class MinhashPropertySpec extends SparkSpec {

  private val P = 2147483647L

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def hash48(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 12), 16)

  /** Brute-force band set: tokenize → distinct 3-gram shingles → drop
    * df > 100 → 12 affine-permuted minima → 4 bands of 3.
    */
  private def bruteBands(docs: Seq[(Long, String)]): Set[(Long, Int, String)] = {
    val shingled = docs.map { case (id, text) =>
      val t = text.split("\\s+").filter(_.nonEmpty)
      val shs =
        if (t.length < 3) Vector.empty[String]
        else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").distinct.toVector
      id -> shs
    }
    val df = shingled.flatMap(_._2).groupBy(identity).map { case (sh, o) => sh -> o.size }
    val kept = shingled.map { case (id, shs) => id -> shs.filter(sh => df(sh) <= 100) }
    kept.filter(_._2.nonEmpty).flatMap { case (id, shs) =>
      val hs = shs.map(sh => hash48(sh) % P)
      val m = (0 to 11).map { i =>
        hs.map(h => (h * (1103515245L + 12345L * i) + (1000003L * i + 54321L)) % P).min
      }
      (0 to 3).map(b => (id, b, s"${m(b * 3)},${m(b * 3 + 1)},${m(b * 3 + 2)}"))
    }.toSet
  }

  test("both Spark band routes equal the brute force, stop-shingle guard active") {
    import spark.implicits._
    val rnd = new Random(41)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    def salad(n: Int) = Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    val docs: Seq[(Long, String)] =
      // 120 docs sharing one planted phrase -> its shingles hit df > 100
      (0L until 120L).map(id => id -> s"hot stop phrase guard ${salad(6 + rnd.nextInt(10))}") ++
        Seq(
          200L -> "",                      // empty
          201L -> "one",                   // <3 tokens: no shingles
          202L -> "just two",              //
          203L -> "exactly three tokens",  // one shingle
          204L -> "rep rep rep rep rep",   // repeated shingle collapses
          205L -> salad(40))               // plain doc
    val dir = java.nio.file.Files.createTempDirectory("minhash_prop").toString
    docs.map { case (id, text) => (id, text, "xx", "gen", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val expected = bruteBands(docs)
    assert(expected.nonEmpty)
    // the planted phrase must actually activate the guard: its shingles
    // (df = 120 > MaxDf) are dropped, so no two hot-phrase docs may share
    // a band key through the phrase alone
    assert(Dedup.hotShingleList(spark, dir).nonEmpty)

    val staged = Dedup.minhashBandIndex(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(staged == expected)

    val arrayRoute = Dedup.withBandStructs(Dedup.keptSets(spark, dir), "shs")
      .select($"doc_id", org.apache.spark.sql.functions.explode($"_bands").as("bk"))
      .select($"doc_id", $"bk.band", $"bk.key")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(arrayRoute == expected)
  }
}
