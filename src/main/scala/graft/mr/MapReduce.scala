package graft.mr

import org.apache.spark.sql.{Dataset, Encoders}

import graft.core.KV

/** The reference's generic MapReduce engine surface, Spark-first.
  *
  * Reference dataflow (ref: mr/worker.go:38-154, mr/master.go:36-127):
  * whole-file input → Map UDF (1 record → N KVs) → FNV-hash partition →
  * sort → group per key → Reduce UDF → one output record per key.
  *
  * Spark expression: `flatMap` (the Map UDTF slot) → `groupByKey` (shuffle
  * = the map→reduce barrier of mr/master.go:102-105; Spark's sort-based
  * shuffle subsumes the reference's mr-X-Y intermediate files) →
  * `mapGroups` (the Reduce UDAF slot). Task retry/speculation subsume the
  * reference's 10 s timeout re-execution (mr/master.go:200-214); the file
  * commit protocol subsumes its temp-file + rename commit
  * (mr/worker.go:71-82).
  *
  * We implement the *merged-group* semantics of the sequential oracle
  * (main/mrsequential.go:59-84) — exactly one output record per key —
  * not the per-intermediate-file grouping deviation of mr/worker.go:94-125
  * (see SURVEY.md §3.4).
  *
  * Scale note: `reduceF` receives all values of a key materialized as a
  * Seq, mirroring the reference's `Reduce(key, []string)` contract. For
  * algebraic reducers prefer the DataFrame formulations in
  * [[graft.queries]] (partial aggregation, codegen); this typed path is
  * the arbitrary-closure escape hatch the reference's API promises.
  */
object MapReduce {

  private implicit val kvEnc: org.apache.spark.sql.Encoder[KV] = Encoders.product[KV]
  private implicit val strEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING

  /** Run a full MapReduce job. The reference's NReduce knob
    * (main/mrmaster.go:23) maps to `spark.sql.shuffle.partitions` —
    * shuffle width is a session setting here, not a per-job argument.
    */
  def run(
      input: Dataset[(String, String)],
      mapF: (String, String) => IterableOnce[KV],
      reduceF: (String, Seq[String]) => String): Dataset[KV] = {
    val mapped = input.flatMap { case (k, v) => mapF(k, v) }
    val grouped = mapped.groupByKey(_.key)
    grouped.mapGroups { (k, it) =>
      // Values arrive grouped but unsorted — same contract as the
      // reference, whose reducers sort internally when they care
      // (mrapps/crash.go:50-52, mrapps/indexer.go:37).
      KV(k, reduceF(k, it.map(_.value).toSeq))
    }
  }
}

/** Single-process oracle — the semantic ground truth the reference's
  * golden-output tests diff against (ref: main/mrsequential.go:38-84,
  * main/test-mr.sh:59-67).
  */
object Sequential {
  def run(
      files: Seq[(String, String)],
      mapF: (String, String) => IterableOnce[KV],
      reduceF: (String, Seq[String]) => String): Seq[KV] = {
    // IndexedSeq: the run-detection loop below does random access; a
    // List here would make the scan O(n²) on a real-sized corpus.
    val intermediate = files
      .flatMap { case (f, c) => mapF(f, c) }
      .toIndexedSeq
      .sortBy(_.key) // global sort by key (main/mrsequential.go:59)
    // run-detection loop (main/mrsequential.go:68-78)
    val out = Seq.newBuilder[KV]
    var i = 0
    while (i < intermediate.length) {
      var j = i + 1
      while (j < intermediate.length && intermediate(j).key == intermediate(i).key) j += 1
      val values = intermediate.slice(i, j).map(_.value)
      out += KV(intermediate(i).key, reduceF(intermediate(i).key, values))
      i = j
    }
    out.result()
  }
}
