package graft.queries

import graft.SparkSpec

/** Pins the multi-table sign-LSH tier's structural guarantee: table 0
  * IS the single-table tier's hash (dims 1..8), so the multi-table
  * candidate set is a superset and per-probe recall can never drop
  * below the single-table meter. The measured improvement (≈T× at low
  * collision rates, 0.024 → 0.088 at sf0.1) is a corpus fact the
  * oracle hash-pins; the spec pins the dominance invariant.
  */
class LshMultiSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("multi-table recall dominates single-table recall per probe") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    def byProbe(q: String): Map[Long, (Long, Long)] =
      Similarity.queries(q)(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val single = byProbe("ann_lsh_recall")
    val multi = byProbe("ann_lsh_multi_recall")
    assert(single.keySet == multi.keySet)
    single.foreach { case (probe, (_, nCommonSingle)) =>
      val (_, nCommonMulti) = multi(probe)
      assert(nCommonMulti >= nCommonSingle,
        s"probe $probe: multi-table recall fell below its table-0 subset")
    }
    val rs = single.values.map(_._2).sum.toDouble / single.values.map(_._1).sum
    val rm = multi.values.map(_._2).sum.toDouble / multi.values.map(_._1).sum
    info(f"recall single=$rs%.3f multi(T=${Similarity.LshTables})=$rm%.3f")
  }

  test("ann_lsh_multi: dense ranks, no self-pairs") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val r = Similarity.queries("ann_lsh_multi")(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getLong(0) != row.getLong(2)))
    r.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length).toSeq)
    }
  }
}
