package graft.queries

import graft.SparkSpec

/** Pins the tx_gopher_rules rule battery on crafted edge-case documents
  * — each rule violated in isolation by one doc, one doc passing every
  * rule, and the degenerate token-free doc (whose NULL statistics must
  * FAIL their rules, not propagate). The DuckDB oracle pins the query
  * on the real corpus at three SFs; this pins the rule SEMANTICS.
  */
class GopherRulesSpec extends SparkSpec {

  private val passing =
    Iterator.continually("the quick brown fox jumps over and runs with care")
      .take(5).mkString(" ") // 50 words, mean len 4.2, 3 distinct req stops

  private val docs = Seq(
    (0L, "", "en"),                                          // token-free
    (1L, "- item one\n- item two\n- item three", "en"),      // all-bullet
    (2L, "line one...\nline two...\nplain line", "en"),      // ellipsis-heavy
    (3L, "## ## ## tag", "en"),                              // symbol-heavy
    (4L, "123 456 789 000", "en"),                           // no alpha words
    (5L, passing, "en"))                                     // passes all

  test("each rule trips on its crafted violator; the clean doc passes all") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gopher_rules").toString
    try {
      docs.toDF("doc_id", "text", "lang")
        .withColumn("source", org.apache.spark.sql.functions.lit("t"))
        .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val rows = graft.SparkEntry.queries("tx_gopher_rules")(spark, dir)
        .collect().map(r => r.getLong(0) -> r).toMap
      assert(rows.size == docs.size)

      def flag(id: Long, name: String): Long =
        rows(id).getAs[Long](name)

      // doc 0: no tokens -> NULL ratios fail their rules, keep = 0
      assert(flag(0L, "r_wc") == 0L && flag(0L, "r_mwl") == 0L
        && flag(0L, "r_alpha") == 0L && flag(0L, "keep") == 0L)
      // doc 1: 3/3 lines start with a bullet -> r_bullet trips
      assert(flag(1L, "r_bullet") == 0L)
      assert(rows(1L).getAs[Double]("bullet_ratio") == 1.0)
      // doc 2: 2/3 lines end with '...' -> r_ell trips
      assert(flag(2L, "r_ell") == 0L)
      assert(rows(2L).getAs[Double]("ellipsis_ratio") == 0.6667)
      // doc 3: 6 '#' over 4 words -> symbol ratio 1.5 -> r_sym trips
      assert(flag(3L, "r_sym") == 0L)
      assert(rows(3L).getAs[Double]("symbol_ratio") == 1.5)
      // doc 4: zero alphabetic words -> r_alpha trips
      assert(flag(4L, "r_alpha") == 0L)
      assert(rows(4L).getAs[Double]("alpha_ratio") == 0.0)
      // doc 5: every rule passes
      assert(flag(5L, "keep") == 1L)
      Seq("r_wc", "r_mwl", "r_sym", "r_bullet", "r_ell", "r_alpha", "r_stop")
        .foreach(f => assert(flag(5L, f) == 1L, s"doc 5 should pass $f"))

      // invariant on every row: keep == AND of the seven flags
      rows.values.foreach { r =>
        val prod = Seq("r_wc", "r_mwl", "r_sym", "r_bullet", "r_ell",
          "r_alpha", "r_stop").map(r.getAs[Long](_)).product
        assert(r.getAs[Long]("keep") == prod)
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
