package graft.queries

import graft.SparkSpec

/** Pins the simhash hot-bucket recall meter (VERDICT r01 #8: the skew
  * guard's recall loss must be observable, not silent). On the sf0.001
  * test corpus the meter must be internally consistent; the absolute
  * drop counts are corpus-dependent and are REPORTED (ScaleProbe prints
  * them per run) rather than pinned.
  */
class DedupMeterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("simhash drop meter is internally consistent") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val r = Dedup.simhashDropStats(spark, dir).collect()(0)
    val (affected, invisible, bandRows, total) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    info(s"docs_affected=$affected docs_invisible=$invisible " +
      s"band_rows_dropped=$bandRows docs_total=$total")
    assert(total > 0)
    assert(affected >= invisible)
    assert(affected <= total)
    // each affected doc drops between 1 and 4 band rows
    assert(bandRows >= affected && bandRows <= affected * 4)
    // an invisible doc is one that lost all 4 bands
    assert(bandRows >= invisible * 4)
  }

  test("incremental dedup decisions are consistent with the batch LSH pairs") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    import org.apache.spark.sql.Row
    // batch self-dedup pair set (unordered ia < ib) with exact jac
    val pairs = Dedup.queries("dedup_minhash_lsh")(spark, dir)
      .collect().map { case Row(ia: Long, ib: Long, jac: Double) => ((ia, ib), jac) }
      .toMap
    val incr = Dedup.queries("dedup_incremental")(spark, dir).collect()
    assert(incr.nonEmpty)
    incr.foreach { case Row(ni: Long, oi: Long, jac: Double) =>
      // the split is real: new side is doc_id % 5 == 0, matches are not
      assert(ni % 5 == 0 && oi % 5 != 0)
      // every incremental decision is one of the batch pairs with the
      // same verified jac (same band index, same verifier — the
      // asymmetric join can only restrict, never invent)
      val key = (math.min(ni, oi), math.max(ni, oi))
      assert(pairs.get(key).contains(jac),
        s"($ni, $oi, $jac) not in the batch LSH pair set")
    }
  }
}
