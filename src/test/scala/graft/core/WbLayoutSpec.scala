package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The shared word-bucketed layout helper, pinned at the unit level:
  * bucket sizing bounds, sidecar round-trip, and the prune's three
  * shapes (bucket+term In on a bucketed slice, term-In on a flat one,
  * semi-join fallback past the term-In budget — identical rows in all
  * cases, empty probe → empty result).
  */
class WbLayoutSpec extends SparkSpec {

  test("bucket sizing is a clamped power of two") {
    assert(WbLayout.bucketsFor(0L) == 16)
    assert(WbLayout.bucketsFor(50000L * 64) == 64)
    assert(WbLayout.bucketsFor(50000L * 65) == 64) // rounds DOWN to a power
    assert(WbLayout.bucketsFor(Long.MaxValue / 2) == 4096)
  }

  test("sidecar round-trips and is absent for pre-bucketing artifacts") {
    val dir = java.nio.file.Files.createTempDirectory("wbsidecar").toString
    assert(WbLayout.readSidecar(dir).isEmpty)
    WbLayout.writeSidecar(dir, 128)
    assert(WbLayout.readSidecar(dir).contains(128))
  }

  test("prune restricts to exactly the probed terms on bucketed and flat " +
      "slices, including past the term-In budget") {
    import spark.implicits._
    val nb = 16
    val terms = (0 until 3000).map(i => s"w$i")
    val slice = terms.zipWithIndex.map { case (w, i) => (w, i.toLong) }
      .toDF("word", "doc_id")
    val bucketed = WbLayout.bucketed(slice, "word", nb)
    // small probe: literal In path
    val p1 = WbLayout.probeOf(Seq("w1", "w2", "w9999").toDF("word"), "word", nb)
    assert(WbLayout.prune(bucketed, "word", p1)
      .select($"word").collect().map(_.getString(0)).toSet == Set("w1", "w2"))
    assert(WbLayout.prune(slice, "word", p1)
      .select($"word").collect().map(_.getString(0)).toSet == Set("w1", "w2"))
    // oversized probe (> 1024 terms): the semi-join fallback must keep
    // identical rows — every probed term present in the slice
    val big = terms.take(2000).toDF("word")
    val p2 = WbLayout.probeOf(big, "word", nb)
    assert(p2.terms.size == 2000)
    assert(WbLayout.prune(bucketed, "word", p2).count() == 2000L)
    assert(WbLayout.prune(slice, "word", p2).count() == 2000L)
    // empty probe: empty result, not a scan
    val p0 = WbLayout.probeOf(Seq.empty[String].toDF("word"), "word", nb)
    assert(WbLayout.prune(bucketed, "word", p0).count() == 0L)
  }

  test("the bucketed layout's wb column matches the probe's bucketing") {
    import spark.implicits._
    val nb = 32
    val slice = (0 until 500).map(i => (s"t$i", i.toLong)).toDF("word", "doc_id")
    val bucketed = WbLayout.bucketed(slice, "word", nb)
    val recomputed = bucketed
      .withColumn("wb2", pmod(xxhash64($"word"), lit(nb.toLong)).cast("int"))
    assert(recomputed.filter($"wb" =!= $"wb2").count() == 0L)
  }
}
