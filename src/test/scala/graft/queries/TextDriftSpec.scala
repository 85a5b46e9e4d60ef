package graft.queries

import org.apache.spark.sql.functions.{length, lit}

import graft.SparkSpec

/** Drift-monitor semantics on planted splits with hand-computable
  * divergence: identical distributions read 0; disjoint vocabularies
  * read ln 2 (in 6-dec contribution arithmetic).
  */
class TextDriftSpec extends SparkSpec {

  private def dirFor(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("identical split distributions diverge by zero") {
    val dir = dirFor(Seq(1L -> "a b", 2L -> "a b", 5L -> "a b", 10L -> "a b"))
    val r = TextAnalysis.queries("tx_corpus_drift")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_vocab_union") == 2L)
    assert(r.getAs[Double]("js") == 0.0)
  }

  test("disjoint vocabularies diverge by ln 2 under the 6-dec contribution round") {
    val dir = dirFor(Seq(1L -> "a a", 5L -> "b b"))
    val r = TextAnalysis.queries("tx_corpus_drift")(spark, dir).collect()(0)
    // per one-sided token: round(1·ln2/2, 6) = 0.346574; two tokens
    assert(r.getAs[Double]("js") == 0.693148)
    val toks = TextAnalysis.queries("tx_drift_tokens")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(3)))
    assert(toks.toSeq == Seq(("a", 0.346574), ("b", 0.346574)))
  }
}
