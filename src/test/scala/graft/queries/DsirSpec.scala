package graft.queries

import graft.SparkSpec

/** Pins the DSIR importance-weight family semantics: the estimator must
  * rank documents of the target domain (lang = DsirTargetLang) above the
  * rest — that is the whole point of importance weighting — and the
  * selection query must emit a dense, deterministic top-K. Exact values
  * are hash-pinned by the DuckDB oracle at the gate SFs.
  */
class DsirSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def ready = new java.io.File(dir).isDirectory

  test("tx_dsir_weights: target-language docs carry higher mean weight") {
    assume(ready, s"$dir not present")
    val rows = TextAnalysis.queries("tx_dsir_weights")(spark, dir).collect()
    assert(rows.nonEmpty)
    val (tgt, rest) = rows.partition(_.getString(1) == TextAnalysis.DsirTargetLang)
    assert(tgt.nonEmpty && rest.nonEmpty, "corpus must contain both classes")
    val meanTgt = tgt.map(_.getDouble(3)).sum / tgt.length
    val meanRest = rest.map(_.getDouble(3)).sum / rest.length
    info(f"mean avg_logw: target=$meanTgt%.4f rest=$meanRest%.4f")
    assert(meanTgt > meanRest,
      "importance weights must favor the target domain on average")
  }

  test("tx_dsir_hashed: fixed feature space reproduces the target preference") {
    assume(ready, s"$dir not present")
    val rows = TextAnalysis.queries("tx_dsir_hashed")(spark, dir).collect()
    assert(rows.nonEmpty)
    val (tgt, rest) = rows.partition(_.getString(1) == TextAnalysis.DsirTargetLang)
    assert(tgt.nonEmpty && rest.nonEmpty)
    val meanTgt = tgt.map(_.getDouble(3)).sum / tgt.length
    val meanRest = rest.map(_.getDouble(3)).sum / rest.length
    info(f"hashed-bigram mean avg_logw: target=$meanTgt%.4f rest=$meanRest%.4f")
    assert(meanTgt > meanRest,
      "the 4096-bucket estimator must preserve the target-domain preference")
  }

  test("tx_budget_select: admitted token mass never exceeds the budget") {
    assume(ready, s"$dir not present")
    val rows = TextAnalysis.queries("tx_budget_select")(spark, dir).collect()
    assert(rows.nonEmpty, "the threshold must admit at least one bin")
    val budget = rows.head.getLong(3)
    val selected = rows.map(_.getLong(2)).sum
    info(s"selected $selected of budget $budget tokens " +
      s"(thr_bin=${rows.head.getLong(4)})")
    assert(selected <= budget, "greedy admission overflowed the budget")
    assert(selected > 0)
  }

  test("tx_dsir_select: dense ranks, target language dominates the selection") {
    assume(ready, s"$dir not present")
    val sel = TextAnalysis.queries("tx_dsir_select")(spark, dir).collect()
    val k = math.min(TextAnalysis.DsirSelectK,
      TextAnalysis.queries("tx_dsir_weights")(spark, dir).count().toInt)
    assert(sel.length == k, s"selection must emit exactly $k rows")
    assert(sel.map(_.getInt(1)).sorted.toSeq == (1 to k).toSeq, "ranks dense 1..K")
    val enShare = sel.count(_.getString(2) == TextAnalysis.DsirTargetLang).toDouble / k
    val corpus = TextAnalysis.queries("tx_dsir_weights")(spark, dir).collect()
    val enBase = corpus.count(_.getString(1) == TextAnalysis.DsirTargetLang)
      .toDouble / corpus.length
    info(f"selected target share=$enShare%.3f vs corpus base rate=$enBase%.3f")
    assert(enShare > enBase,
      "selection must up-weight the target domain beyond its base rate")
  }
}
