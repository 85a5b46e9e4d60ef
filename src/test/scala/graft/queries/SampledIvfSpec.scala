package graft.queries

import graft.SparkSpec

/** Pins the sample-trained IVF quantizer exhibit: the deterministic 20%
  * training sample, the full-corpus assignment, and the serving-query
  * contract (nprobe=2, k=5 per probe). The sampled quantizer's cells may
  * legitimately differ from the full-trained quantizer's near cell
  * boundaries — the spec REPORTS the agreement of the two serving
  * queries' result sets rather than pinning it, and asserts only the
  * invariants that hold by construction.
  */
class SampledIvfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sampled cell meter: full-corpus assignment, ~20% deterministic sample") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val m = Similarity.queries("ann_ivf_sampled_cells")(spark, dir).collect()(0)
    val cells = m.getLong(0)
    val maxCell = m.getLong(1)
    val nVec = m.getLong(2)
    val sampleN = m.getLong(4)
    info(s"cells_used=$cells max_cell=$maxCell n_vectors=$nVec sample_size=$sampleN")
    assert(nVec == 500L, "every vector must be assigned (assignment is full-corpus)")
    assert(cells >= 1L && cells <= 10L, "gate regime: at most the 10 label cells")
    assert(maxCell <= nVec)
    // binomial(500, 0.2): ±5σ ≈ ±45 around 100
    assert(sampleN > 55L && sampleN < 145L, s"sample_size=$sampleN implausible for 20% of 500")
  }

  test("sampled serving query: 5 neighbors per probe, ranks 1..5") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val r = Similarity.queries("ann_ivf_sampled_topk")(spark, dir).collect()
    val byProbe = r.groupBy(_.getLong(0))
    assert(byProbe.nonEmpty)
    byProbe.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length).toSeq)
    }
    // report how often sampled training reproduces the full-trained
    // tier's neighbors. On THIS corpus the labels are weak clusters
    // (near-isotropic vectors), so perturbing the centroids reshuffles
    // cell assignment wholesale and agreement is genuinely low (~33% at
    // sf0.001) — that is a property of the data, not a defect, and on a
    // corpus with real cluster structure it rises toward 1. Both tiers
    // must still serve the SAME probe set (every probe always has ≥ k
    // candidates in its two cells here).
    val full = Similarity.queries("ann_ivf2_topk")(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(2))).toSet
    val sampled = r.map(x => (x.getLong(0), x.getLong(2))).toSet
    val overlap = sampled.intersect(full).size.toDouble / full.size
    info(f"sampled vs full-trained neighbor agreement: ${overlap * 100}%.1f%%")
    assert(sampled.map(_._1) == full.map(_._1), "probe sets must match across tiers")
  }
}
