package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the IVF-PQ tier (round 5): codebook geometry, quantization
  * quality, and an observed recall floor on the gate corpus. The gate
  * oracles pin exact values; this spec pins the QUALITY contract — the
  * numbers the M/K/shortlist sweep was tuned against (SCALING.md) — so
  * a quantizer regression fails loudly even if it stays self-consistent
  * with its own oracle.
  */
class PqSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def present = new java.io.File(dir).isDirectory

  test("codebook geometry and quantization error on the gate corpus") {
    assume(present, s"$dir not present")
    val r = Similarity.queries("ann_pq_codes")(spark, dir).collect()(0)
    assert(r.getAs[Long]("codebook_rows") === 256L) // M=16 × K=16
    assert(r.getAs[Long]("codes_used") <= 256L)
    // measured 163.8 vs 478.7 (34%) — a meaningful regression (e.g. the
    // sign seeding or the Lloyd step breaking) pushes this past half
    assert(r.getAs[Double]("quant_error") <
      r.getAs[Double]("resid_energy") * 0.5,
      "PQ codes must explain at least half the residual energy")
  }

  test("recall@5 against exact brute force stays above the floor") {
    assume(present, s"$dir not present")
    import spark.implicits._
    val rec = Similarity.queries("ann_pq_recall")(spark, dir)
      .agg((sum($"n_common").cast("double") / sum($"n_exact")).as("recall"))
      .collect()(0).getDouble(0)
    info(f"observed PQ recall@5 = $rec%.3f (measured 0.392 at tuning time)")
    assert(rec >= 0.2, f"PQ recall@5 collapsed: $rec%.3f")
  }
}
