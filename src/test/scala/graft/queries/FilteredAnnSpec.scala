package graft.queries

import graft.SparkSpec

/** Pins the filtered-vector-search family: the allowed-metadata
  * predicate (vec_id % AnnFilterMod == 0) must hold on every emitted
  * neighbor of both pre-filter routes, ranks must be dense per probe,
  * and the post-filter meter's counts must be internally consistent
  * (n_common ≤ min(n_true, n_post) ≤ 5). Recall numbers are REPORTED,
  * not pinned — they are corpus-shape facts, and the DuckDB oracle
  * already hash-pins the exact values at the gate SFs.
  */
class FilteredAnnSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def ready = new java.io.File(dir).isDirectory

  test("ann_filtered_topk: only allowed neighbors, dense ranks per probe") {
    assume(ready, s"$dir not present")
    val r = Similarity.queries("ann_filtered_topk")(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getLong(2) % Similarity.AnnFilterMod == 0,
        s"neighbor ${row.getLong(2)} violates the metadata predicate")
    }
    r.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length).toSeq)
    }
  }

  test("ann_filtered_ivf: only allowed neighbors; report recall vs exact truth") {
    assume(ready, s"$dir not present")
    val ivf = Similarity.queries("ann_filtered_ivf")(spark, dir).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { row =>
      assert(row.getLong(2) % Similarity.AnnFilterMod == 0)
    }
    val truth = Similarity.queries("ann_filtered_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val found = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (truth & found).size.toDouble / truth.size
    info(f"filtered IVF (nprobe=2) recall vs exact filtered truth: $recall%.3f")
    assert(recall > 0.0, "the index route must find some of the filtered truth")
  }

  test("ann_postfilter_recall: counts consistent; post route loses vs pre-filter") {
    assume(ready, s"$dir not present")
    val m = Similarity.queries("ann_postfilter_recall")(spark, dir).collect()
    assert(m.length == 25, "one meter row per probe")
    var nTrue = 0L; var nCommon = 0L
    m.foreach { row =>
      val (t, p, c) = (row.getLong(1), row.getLong(2), row.getLong(3))
      assert(t <= 5 && p <= 5, "both routes keep at most k=5")
      assert(c <= math.min(t, p), "overlap bounded by both sides")
      nTrue += t; nCommon += c
    }
    val recall = nCommon.toDouble / nTrue
    info(f"post-filter recall (shortlist=${Similarity.PostFilterShortlist}): $recall%.3f")
    // The allowed subset outside the shortlist is invisible to the post
    // route by construction; with a 25% filter and a 20-deep shortlist
    // the loss is structural, but its exact size is a corpus fact — the
    // oracle pins it, the spec only requires the meter to be sane.
    assert(recall > 0.0 && recall <= 1.0)
  }
}
