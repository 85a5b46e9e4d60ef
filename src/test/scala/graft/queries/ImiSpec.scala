package graft.queries

import graft.SparkSpec

/** Pins the inverted-multi-index tier's design claims (the geometry the
  * DuckDB oracle hashes can't express as an inequality):
  *
  *  1. candidate shrink — the K²-fine product cells must strictly cut
  *     the within-cell pair count versus the K-cell flat quantizer at
  *     the same codebook storage (the reason IMI exists);
  *  2. probe containment — every probe's own product cell is among its
  *     ≤4 probed cells, so a probe always has a non-empty candidate set
  *     (its own cell-mates) and the search can never silently return
  *     the empty set for a populated cell.
  */
class ImiSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("IMI product cells strictly shrink within-cell pairs vs flat IVF") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val imi = Similarity.imiCellStats(spark, dir).collect()(0)
    val ivf = Similarity.embCellStats(spark, dir).collect()(0)
    assert(imi.getAs[Long]("n_vectors") == ivf.getAs[Long]("n_vectors"))
    assert(imi.getAs[Long]("cells_used") > ivf.getAs[Long]("n_vectors") / 50,
      "product cells should be plentiful")
    assert(imi.getAs[Long]("within_cell_pairs") < ivf.getAs[Long]("within_cell_pairs"),
      s"IMI pairs ${imi.getAs[Long]("within_cell_pairs")} must undercut " +
        s"flat ${ivf.getAs[Long]("within_cell_pairs")}")
    assert(imi.getAs[Long]("codebook_rows") == 20L)
  }

  test("every probe searches its own cell: results are never empty") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    import spark.implicits._
    val res = graft.SparkEntry.queries("ann_imi_topk")(spark, dir)
      .select($"probe").distinct().collect().map(_.getLong(0)).toSet
    // every probe id < 50 exists in the corpus and its own cell holds at
    // least one other vector at this SF, so all 50 probes must answer
    assert(res == (0L until 50L).toSet, s"missing probes: ${(0L until 50L).toSet -- res}")
  }

  test("IMI recall@5 at the serving default stays above the floor") {
    // the w=5 round-10 default reads 0.544 at sf0.1 (SCALING.md frontier);
    // this floor catches a serving regression, not corpus noise
    val (rec, rows) = Similarity.imiServingMeter(
      spark, "/root/testdata/sf0.01", 25, Similarity.ImiHalfProbe)
    info(f"IMI recall@5 = $rec%.3f over $rows candidate rows (w = ${Similarity.ImiHalfProbe})")
    assert(rec >= 0.3, f"IMI serving recall collapsed: $rec%.3f")
  }
}
