package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** The generation-resolving foreachBatch loop every serving tier runs
  * — ONE device, shared by the lexical (BM25 + QL), positional and
  * dedup streams: resolve `root`'s `_latest` pointer per micro-batch,
  * reload the artifact through `load` only when the generation number
  * changed (live cutover on republish; rollback is the same pointer
  * pointed backwards), serve the batch through `score`, hand the
  * finished frame to `sink`. A vanished pointer is an ERROR, never
  * license to keep serving a stale cached generation — the same
  * contract as the never-loaded case. (The vector tier's
  * [[AnnStream.pqServeLatest]] keeps its own typed loop — it caches a
  * derived centroid map beside the generation — and
  * [[GateStream.admittedLatest]] its ledger-recovering one.)
  */
private[streaming] object GenServe {

  def latestLoop[G](queries: DataFrame, root: String, what: String,
      genOf: G => Long)(
      load: (SparkSession, String) => G)(
      score: (SparkSession, G, DataFrame) => DataFrame)(
      sink: DataFrame => Unit): DataStreamWriter[Row] = {
    var cached: Option[G] = None
    val fn: (DataFrame, Long) => Unit = { (batch, _) =>
      if (!batch.isEmpty) {
        val s = batch.sparkSession
        val latest = graft.core.Generations.latest(root).getOrElse(
          sys.error(s"$root: no committed $what serving generation"))
        if (!cached.map(genOf).contains(latest)) cached = Some(load(s, root))
        sink(score(s, cached.get, batch))
      }
    }
    queries.writeStream.foreachBatch(fn).outputMode(OutputMode.Update())
  }
}
