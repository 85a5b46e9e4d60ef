package graft.queries

import graft.SparkSpec

/** Pins the index-maintenance drift meter's accounting invariants:
  * every vector lands in exactly one cell (populations partition the
  * corpus), and the mean-shift term is a nonnegative, finite quantity.
  * Exact values are hash-pinned by the DuckDB oracle.
  */
class CentroidDriftSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ann_centroid_drift: populations partition the corpus; drift finite") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val rows = Similarity.queries("ann_centroid_drift")(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val corpus = graft.core.Tables(spark, dir).embeddings.count()
    assert(total == corpus,
      s"cells account for $total of $corpus vectors — assignment must partition")
    rows.foreach { r =>
      val d = r.getDouble(3)
      assert(d >= 0.0 && !d.isNaN && !d.isInfinite)
      assert(r.getLong(1) > 0, "every reported cell has existing occupants")
    }
    val maxDrift = rows.map(_.getDouble(3)).max
    info(f"cells=${rows.length} max drift4_ppm=$maxDrift%.2f")
  }
}
