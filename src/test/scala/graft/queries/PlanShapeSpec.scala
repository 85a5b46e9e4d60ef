package graft.queries

import graft.SparkSpec

/** Plan-shape regression tests: the physical properties documented in
  * PLANS.md must survive refactors — pushdown reaching the scan,
  * broadcast star joins, top-k without global sort, partial aggregation,
  * and no accidental cartesian products anywhere.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p.take(2000))
  }

  test("q_topk plans TakeOrderedAndProject (no global sort)") {
    assert(plan("q_topk").contains("TakeOrderedAndProject"))
  }

  test("q5 star join broadcasts every dimension side") {
    val p = plan("q5_nation_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("a1_wordcount plans partial + final hash aggregation") {
    val p = plan("a1_wordcount")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("ann top-k plans the bounded-heap aggregate, not a window sort") {
    Seq("ann_topk", "ann_ivf_topk", "ann_lsh_topk").foreach { name =>
      val p = plan(name)
      assert(!p.contains("Window"), s"window sort in $name: ${p.take(2000)}")
      assert(p.contains("grouped_topk"), s"no grouped_topk in $name")
    }
  }

  test("dedup_clusters result plan is lineage-truncated (constant size)") {
    // localCheckpoint each round must leave the final plan a flat scan of
    // the checkpointed labels — no nested per-round joins.
    val p = plan("dedup_clusters")
    assert(!p.contains("Join"), p.take(2000))
    assert(p.length < 4000, s"plan grew to ${p.length} chars — lineage not truncated")
  }

  test("ann_ivf2 assigns cells by aggregate argmin, probes via bounded heap — no window") {
    val p = plan("ann_ivf2_topk")
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("grouped_topk"), "2-nearest-cell probe should use the bounded heap")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "centroid table should broadcast")
  }

  test("kv_migration broadcasts the config table and the epoch scalar") {
    val p = plan("kv_migration")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("tx_decontaminate broadcasts the eval gram set") {
    val p = plan("tx_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("tx_repetition is a shuffle-free narrow projection") {
    val p = plan("tx_repetition")
    // the only exchange allowed is the final presentation sort
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"unexpected shuffles in tx_repetition: ${p.take(2000)}")
    assert(!p.contains("Join"))
  }

  test("dedup_spans: one doc-partitioned window over the staged index, no cartesian") {
    val p = plan("dedup_spans")
    assert("Window".r.findAllIn(p).size == 1, p.take(2000)) // one gaps-and-islands pass
    assert(p.contains("InMemoryTableScan"), "window index should be session-staged")
    assert(!p.contains("CartesianProduct"))
  }

  test("ann_ivf_quantized: bounded heaps end-to-end, broadcast probes, no window") {
    val p = plan("ann_ivf_quantized")
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("grouped_topk"), "retrieve + final stages should use the bounded heap")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "probe set should broadcast")
  }

  test("ann_pq_topk: code lookup joins broadcast, bounded heaps, no window, no cartesian") {
    val p = plan("ann_pq_topk")
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("grouped_topk"),
      "shortlist + final stages should use the bounded heap")
    assert(p.contains("BroadcastHashJoin"),
      "the ADC table / bq / probe joins must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("kv_reroute joins configs and the final rollup by broadcast") {
    val p = plan("kv_reroute")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "metadata-sized sides must not sort-merge")
    assert(!p.contains("CartesianProduct"))
  }

  test("dedup_jaccard_prefix: staged prefix index feeds both join sides, no cartesian") {
    val p = plan("dedup_jaccard_prefix")
    // both sides of the candidate self-join must read the SAME persisted
    // prefix index (the rarity-ranking window runs once, inside the
    // cached relation — it prints under each InMemoryTableScan but is
    // computed once); no Window may appear in the live plan above them
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.substring(0, p.indexOf("InMemoryTableScan")).contains("Window"),
      "rarity ranking must live inside the staged index, not re-run per query")
    assert(!p.contains("CartesianProduct"))
  }

  test("tx_decontaminate_bloom: bloom enters as a scalar subquery, verify join broadcasts") {
    val p = plan("tx_decontaminate_bloom")
    assert(p.contains("might_contain"), s"bloom probe missing: ${p.take(2000)}")
    assert(p.contains("Subquery") || p.contains("subquery"),
      "bloom must arrive as a scalar subquery, not a collected literal")
    assert(p.contains("BroadcastHashJoin"), "exact verify join should broadcast")
  }

  test("ann_ivf_sampled_topk: bounded heaps, broadcast sampled centroids, no window") {
    val p = plan("ann_ivf_sampled_topk")
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("grouped_topk"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "sampled centroid table should broadcast")
  }

  test("ann_ivf_coarse: bounded-heap coarse probe, broadcast fine centroids, no window") {
    val p = plan("ann_ivf_coarse")
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("grouped_topk"), "coarse top-2 should use the bounded heap")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "centroid tables and 1-row meter frames should broadcast")
  }

  test("q_interval_join: the time-window predicate becomes an equi bin join") {
    val p = plan("q_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval predicate fell back to a nested loop: ${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"),
      "interval join must hash/merge on (user, bin)")
  }

  test("tx_redact is a shuffle-free narrow projection") {
    val p = plan("tx_redact")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"unexpected shuffles in tx_redact: ${p.take(2000)}")
    assert(!p.contains("Join"))
  }

  test("q_approx_quantile broadcasts the per-type sketch anchors back onto events") {
    val p = plan("q_approx_quantile")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_unpivot melts via Expand below the final sort — no join, no window") {
    val p = plan("q_unpivot")
    assert(p.contains("Expand"), p.take(2000))
    assert(!p.contains("Join") && !p.contains("Window"))
  }

  test("q_hopping expands each row into its windows map-side, then partial+final agg") {
    val p = plan("q_hopping")
    assert(p.contains("Expand"), p.take(2000))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "window expansion must feed partial aggregation")
    assert(!p.contains("Join"))
  }

  test("dedup_apply anti-joins the corpus against the drop list, no window sort") {
    val p = plan("dedup_apply")
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(!p.contains("Window"),
      "winner selection must stay an argmax-by-struct aggregate")
  }

  test("q_gapfill fills gaps from the rollup in ONE corpus scan, no join") {
    val p = plan("q_gapfill")
    assert(p.contains("Generate"), p.take(2000)) // sequence() explode
    assert(!p.contains("Join"),
      "gap filling must derive from the rollup, not a spine join")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"events must be scanned exactly once: ${p.take(2000)}")
  }

  test("q_funnel: stage gates are aggregate-then-join, never a window over raw events") {
    val p = plan("q_funnel")
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
    assert("HashAggregate".r.findAllIn(p).size >= 6,
      "each funnel stage must pre-aggregate (partial+final) before joining")
  }

  test("q_cohort aggregates both sides before the user join, no window") {
    val p = plan("q_cohort")
    assert(!p.contains("Window"), p.take(2000))
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "first-week and active-week frames must both pre-aggregate")
  }

  test("q_corr computes all five moments in one aggregation pass, no join") {
    val p = plan("q_corr")
    assert(!p.contains("Join"), p.take(2000))
    assert("HashAggregate".r.findAllIn(p).size == 2,
      "exactly one partial+final aggregate pair")
  }

  test("tx_chunk: one tokenize, shuffle-free chunk explosion") {
    val p = plan("tx_chunk")
    assert(p.contains("Generate"), p.take(2000)) // posexplode
    assert(!p.contains("Join"))
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"unexpected shuffles in tx_chunk: ${p.take(2000)}")
    assert("Scan parquet".r.findAllIn(p).size == 1)
  }

  test("tx_pack: corpus-wide cumsum window is block-partitioned, offsets broadcast") {
    val p = plan("tx_pack")
    // the window that touches every doc row must be PARTITIONED by blk —
    // an unpartitioned global cumsum would serialize the corpus through
    // one task; only the 64×-smaller block-offset table may use the
    // unpartitioned frame
    assert("windowspecdefinition\\(blk#\\d+L, doc_id".r.findFirstIn(p).isDefined,
      s"per-doc cumsum must partition by blk: ${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"), "block offsets should broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("tx_mix: rate table broadcasts, one corpus scan feeds the filter") {
    val p = plan("tx_mix")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "the 5-row rate table must not sort-merge")
  }

  test("tx_pack_shuffled: shuffled-order cumsum still partitions by block") {
    val p = plan("tx_pack_shuffled")
    assert("windowspecdefinition\\(blk#\\d+L, h#".r.findFirstIn(p).isDefined,
      s"per-doc cumsum must partition by the md5-prefix block: ${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"), "block offsets should broadcast")
  }

  test("tx_mix_upsample: factor table broadcasts; replication is a generator, not a join") {
    val p = plan("tx_mix_upsample")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("Generate"), "per-doc replication should be an explode")
    assert(!p.contains("SortMergeJoin"))
  }

  test("ann_imi_topk: bounded-heap probes over the product cells, no window") {
    val p = plan("ann_imi_topk")
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("grouped_topk"), "per-half top-2 should use the bounded heap")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "probe set should broadcast")
  }

  test("tx_bigram_logprob: LM tables broadcast, fold in a projection, no window") {
    val p = plan("tx_bigram_logprob")
    assert(p.contains("BroadcastHashJoin"),
      s"bigram/unigram LM joins should broadcast at this SF: ${p.take(2000)}")
    assert(!p.contains("Window"))
  }

  test("tx_source_cap: bounded-heap per source, not a per-source window sort") {
    val p = plan("tx_source_cap")
    assert(p.contains("grouped_topk"), p.take(2000))
    assert(!p.contains("Window"))
  }

  test("tx_corpus_report: rollup expands, token table joins without cartesian") {
    val p = plan("tx_corpus_report")
    assert(p.contains("Expand"), s"rollup should plan an Expand: ${p.take(2000)}")
    assert(!p.contains("Window"))
  }

  test("dedup_hot_drift: two df aggregations and one equi-join, no window") {
    val p = plan("dedup_hot_drift")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("Window"))
  }

  test("tx_quality_lang is a shuffle-free narrow projection") {
    val p = plan("tx_quality_lang")
    // all four language scores + the quality composition ride one
    // projection; the only exchange allowed is the presentation sort
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"unexpected shuffles in tx_quality_lang: ${p.take(2000)}")
    assert(!p.contains("Join") && !p.contains("Window"))
  }

  test("tx_curation_lang: partial-agg dedup via broadcast semi join, rollup, no window") {
    val p = plan("tx_curation_lang")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p.take(2000))
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(2000))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
  }

  test("ann_cluster_sample: cell-partitioned rank window, broadcast quotas, no global sort") {
    val p = plan("ann_cluster_sample")
    // the rank window must be PARTITIONED (by cell) — an unpartitioned
    // window here would serialize the whole corpus through one task
    assert(!p.contains("WindowExec: No Partition Defined") &&
      !p.contains("No Partition Defined"), p.take(2000))
    assert(p.contains("Window"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("tx_bm25_topk: broadcast term probe, bounded-heap top-k, no window") {
    val p = plan("tx_bm25_topk")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("grouped_topk"), "per-query top-k should use the bounded heap")
    assert(!p.contains("Window"), p.take(2000))
  }

  test("tx_bm25_wand: certificate + rescore stay window-free and heap-based") {
    Seq("tx_bm25_wand", "tx_bm25_wand_meter").foreach { name =>
      val p = plan(name)
      assert(!p.contains("Window"), s"window in $name: ${p.take(2000)}")
      assert(!p.contains("CartesianProduct"), name)
    }
    assert(plan("tx_bm25_wand").contains("grouped_topk"))
  }

  test("tx_bm25_incremental merges the split branches without a window or cartesian") {
    val p = plan("tx_bm25_incremental")
    assert(p.contains("grouped_topk"), p.take(2000))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
  }

  test("tx_bm25_rm3: expansion selection is the ONLY window, and it is qid-partitioned") {
    val p = plan("tx_bm25_rm3")
    // one Window operator (the per-query expansion-term rank); rankings
    // everywhere else go through the bounded heap
    assert("Window(?!GroupLimit)".r.findAllIn(p).size <= 2, p.take(3000))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("grouped_topk"))
  }

  test("tx_ql_topk: broadcast probe + bounded heap, no window") {
    val p = plan("tx_ql_topk")
    assert(p.contains("BroadcastHashJoin") && p.contains("grouped_topk"))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
  }

  test("tx_nb_train: top-k via TakeOrdered + array fold — no window, no global sort") {
    val p = plan("tx_nb_train")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("tx_nb_score: vocabulary model broadcasts onto the held-out postings") {
    val p = plan("tx_nb_score")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
  }

  test("gr_components result plan is lineage-truncated like dedup_clusters") {
    val p = plan("gr_components")
    assert(!p.contains("Join"), p.take(2000))
    assert(p.length < 4000, s"plan grew to ${p.length} chars — lineage not truncated")
  }

  test("gr_triangles: equi-joins only, no window, no cartesian") {
    val p = plan("gr_triangles")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p.take(2000))
  }

  test("tx_phrase_search: probe broadcasts onto postings; only the top-k window") {
    val p = plan("tx_phrase_search")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
    // exactly one window operator — the qid-partitioned top-k
    assert("Window ".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("tx_proximity: plane-sweep windows are (qid, doc)-partitioned, probes broadcast") {
    val p = plan("tx_proximity")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("qid"), p.take(500))
    assert(!p.contains("CartesianProduct"))
  }

  test("no query plans a cartesian product") {
    // dedup_clusters excluded: building its DataFrame executes the
    // iterative clustering loop (an action per round), and the returned
    // plan covers only the final projection anyway.
    (graft.SparkEntry.queries.keySet - "dedup_clusters").foreach { name =>
      assert(!plan(name).contains("CartesianProduct"), s"cartesian in $name")
    }
  }
}
