package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.BloomSketch

/** Pins the bloom-prefiltered decontamination route against the
  * broadcast-join route: the bloom admits false positives but never
  * false negatives, and the exact verify join removes the false
  * positives, so the two must be byte-identical on every corpus. Also
  * pins the BloomSketch primitive itself: no false negatives, and the
  * bloom reaches the plan as a scalar subquery (not a collected
  * literal).
  */
class BloomDeconSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bloom-prefiltered decontamination equals broadcast-join decontamination") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val base = TextAnalysis.queries("tx_decontaminate")(spark, dir).collect().toSeq
    val bloom = TextAnalysis.queries("tx_decontaminate_bloom")(spark, dir).collect().toSeq
    assert(bloom == base)
    assert(base.nonEmpty, "corpus should contain ≥1 contaminated doc for a meaningful test")
  }

  test("bloom sketch has no false negatives over its build set") {
    import spark.implicits._
    val vals = (1L to 1000L).toDF("v")
    val bf = vals.agg(BloomSketch.bloomAgg(xxhash64($"v"), 1000L, 8192L).as("bf")).scalar()
    val misses = vals
      .filter(!BloomSketch.mightContain(bf, xxhash64($"v")))
      .count()
    assert(misses == 0L)
  }

  test("membership probe prunes most non-members (fpp sanity)") {
    import spark.implicits._
    val build = (1L to 1000L).toDF("v")
    val bf = build.agg(BloomSketch.bloomAgg(xxhash64($"v"), 1000L, 65536L).as("bf")).scalar()
    val probes = (1000001L to 1010000L).toDF("v")
    val admitted = probes
      .filter(BloomSketch.mightContain(bf, xxhash64($"v")))
      .count()
    // 65536 bits / 1000 items → fpp well under 1%; allow generous slack
    assert(admitted < 500L, s"bloom admitted $admitted of 10000 non-members")
  }
}
