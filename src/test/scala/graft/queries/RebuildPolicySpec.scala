package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The composed rebuild policy must read all-quiet on the natural
  * corpus and flip EXACTLY the planted family's verdict — one monitor
  * firing must never bleed into another family's rebuild decision.
  */
class RebuildPolicySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def policyRows(d: String): Map[String, (Double, Long)] =
    graft.SparkEntry.queries("tx_rebuild_policy")(spark, d)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getAs[Long]("rebuild")))
      .toMap

  test("all three families read below threshold on the natural corpus") {
    val p = policyRows(dir)
    assert(p.keySet == Set("dedup", "vector", "lexical"))
    assert(p.values.forall(_._2 == 0L), s"unexpected rebuild verdict: $p")
  }

  test("planted embedding drift flips exactly the vector family's verdict") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_policy").toString
    try {
      spark.read.parquet(s"$dir/documents.parquet")
        .write.parquet(s"$tmp/documents.parquet")
      // the arriving split (vec_id % 5 == 0) shifted +0.15 in the
      // leading 4 dims: ~20% of a cell's members moving 0.15/dim pulls
      // the cell mean ~0.03/dim → drift4 ≈ 4·9e-4 ≈ 3600 ppm, past the
      // 2000 ppm retrain line — while an L2 shift of 0.3 is small
      // against the 64-dim cluster separation, so arrivals stay in
      // their trained cells (a relocation-sized shift lands them in
      // new-only cells the existing-mean join drops). The token side is
      // byte-identical, so dedup/lexical must not move.
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select($"vec_id",
          when($"vec_id" % 5 === 0,
            transform($"embedding",
              (x, i) => when(i < 4, x + lit(0.15f)).otherwise(x).cast("float")))
            .otherwise($"embedding").as("embedding"),
          $"label")
        .write.parquet(s"$tmp/embeddings.parquet")

      val base = policyRows(dir)
      val planted = policyRows(tmp)
      assert(planted("vector")._2 == 1L,
        s"planted centroid drift must trigger the vector rebuild: $planted")
      assert(planted("dedup") == base("dedup"),
        "the dedup verdict (and value) must be untouched by embedding drift")
      assert(planted("lexical") == base("lexical"),
        "the lexical verdict (and value) must be untouched by embedding drift")
    } finally {
      graft.queries.Similarity.clearCaches()
      graft.queries.Dedup.clearCaches()
      graft.queries.TextAnalysis.clearCaches()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
