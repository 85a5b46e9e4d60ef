package graft.queries

import graft.SparkSpec

/** Pins the prefix-filter route (dedup_jaccard_prefix — AllPairs/PPJoin
  * candidate generation) against the full inverted-index route
  * (dedup_ngram_jaccard): the prefix filter is EXACT, so the two must
  * produce identical pair sets at every corpus. Also sanity-checks the
  * dedup_prefix_meter invariants: the prefix index is a strict subset of
  * the full index, survivors ≤ candidates, and survivors == the jaccard
  * query's row count.
  */
class PrefixJaccardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("prefix-filtered jaccard equals full inverted-index jaccard") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val full = Dedup.queries("dedup_ngram_jaccard")(spark, dir).collect().toSeq
    val pref = Dedup.queries("dedup_jaccard_prefix")(spark, dir).collect().toSeq
    assert(pref == full)
    assert(full.nonEmpty, "corpus should contain ≥1 near-dup pair for a meaningful test")
  }

  test("prefix meter invariants: prefix ⊂ full index, survivors ≤ candidates") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val m = Dedup.queries("dedup_prefix_meter")(spark, dir).collect()(0)
    val (prefixRows, nCand, nPairs) = (m.getLong(0), m.getLong(1), m.getLong(2))
    info(s"prefix_rows=$prefixRows n_candidates=$nCand n_pairs=$nPairs")
    val fullRows = Dedup.queries("dedup_ngram_jaccard")(spark, dir).count()
    assert(nPairs == fullRows, "meter survivors must equal the jaccard pair count")
    assert(nCand >= nPairs)
    assert(prefixRows > 0)
  }
}
