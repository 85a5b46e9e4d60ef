package graft.queries

import graft.SparkSpec

/** Pins what ann_cluster_sample's numbers MEAN (the DuckDB oracle pins
  * the rows hash-exact ×3 SFs; this pins the sampling contract): per
  * trained cell exactly min(n_c, ceil(√n_c)) members survive, the
  * member set is the deterministic md5-rank prefix, and the sqrt
  * flattening actually flattens — bigger cells keep a smaller fraction.
  */
class ClusterSampleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("per-cell quota honored exactly, deterministic, sqrt-flattened") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("ann_cluster_sample")(spark, dir)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        r.getAs[Long]("n_cell"), r.getAs[Long]("quota")))
    assert(rows.nonEmpty)
    // quota = ceil(sqrt(n_cell)) and the sample hits it exactly (every
    // gate cell holds ≥ quota members at this corpus)
    val perCell = rows.groupBy(_._2)
    perCell.foreach { case (cell, rs) =>
      val n = rs.head._3; val q = rs.head._4
      assert(q == math.ceil(math.sqrt(n.toDouble)).toLong, s"cell $cell quota")
      assert(rs.length == math.min(n, q), s"cell $cell sampled ${rs.length} of quota $q")
    }
    // cells were genuinely compressed (sample ≪ corpus), and the kept
    // fraction FALLS as cells grow — the flattening direction
    val total = perCell.values.map(_.head._3).sum
    assert(rows.length < total / 3, s"sample ${rows.length} of $total barely compressed")
    val fracs = perCell.values.map(rs => (rs.head._3, rs.length.toDouble / rs.head._3)).toSeq
    val big = fracs.maxBy(_._1); val small = fracs.minBy(_._1)
    if (big._1 > small._1)
      assert(big._2 <= small._2, s"bigger cell kept a larger fraction: $big vs $small")

    // the md5-rank-prefix definition, verified INDEPENDENTLY: recompute
    // the kept set from the assignment table with a driver-side md5
    // (java MessageDigest, not Spark's) — per cell, the quota-smallest
    // by (first-12-hex-chars-of-md5 as long, vec_id)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h48(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    import spark.implicits._
    val asg = Similarity.assignments(spark, dir)
      .select($"vec_id", $"alabel".cast("long")).as[(Long, Long)].collect()
    val expected = asg.groupBy(_._2).iterator.flatMap { case (_, members) =>
      val n = members.length
      val q = math.ceil(math.sqrt(n.toDouble)).toLong.toInt
      members.map(_._1).sortBy(id => (h48(id), id)).take(q).iterator
    }.toSet
    assert(rows.map(_._1).toSet == expected,
      "sample is not the md5-rank prefix of each cell")
  }
}
