package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The streaming quality gate must score every arriving doc exactly as
  * the batch `tx_quality_lang` does — same language vote, same rounded
  * score — however the ingest splits into micro-batches, and its
  * admitted/dropped verdicts must match the curation pipelines' 0.7
  * gate doc-for-doc.
  */
class CurationStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming quality gate equals batch tx_quality_lang across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Tables(spark, dir).documents
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val in = MemoryStream[(Long, String)]
    val q = CurationStream.qualityGate(in.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cur_stream")
      .outputMode("append").start()
    // uneven micro-batches, including a singleton
    val cut1 = docs.length / 3
    in.addData(docs.take(cut1): _*); q.processAllAvailable()
    in.addData(docs.slice(cut1, cut1 + 1): _*); q.processAllAvailable()
    in.addData(docs.drop(cut1 + 1): _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("cur_stream")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("pred_lang"), r.getAs[Long]("n_tok"),
          r.getAs[Double]("stop_ratio"), r.getAs[Double]("quality"),
          r.getAs[Boolean]("admitted")))).toMap
    val batch = graft.SparkEntry.queries("tx_quality_lang")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("pred_lang"), r.getAs[Long]("n_tok"),
          r.getAs[Double]("stop_ratio"), r.getAs[Double]("quality")))).toMap
    assert(streamed.size == batch.size)
    batch.foreach { case (id, (lang, nTok, ratio, qual)) =>
      val (sLang, sTok, sRatio, sQual, sAdm) = streamed(id)
      assert((sLang, sTok, sRatio, sQual) == ((lang, nTok, ratio, qual)),
        s"doc $id diverged: stream ${streamed(id)} vs batch ${batch(id)}")
      assert(sAdm == (qual >= 0.7), s"doc $id admitted=$sAdm at quality $qual")
    }
    // the gate must do real work in both directions on the gate corpus
    assert(streamed.values.exists(_._5) && streamed.values.exists(!_._5),
      "gate corpus admitted/dropped split degenerate — threshold inert")

    // survivors = admitted rows exactly
    val in2 = MemoryStream[(Long, String)]
    val q2 = CurationStream.survivors(in2.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cur_stream_surv")
      .outputMode("append").start()
    in2.addData(docs: _*); q2.processAllAvailable(); q2.stop()
    val survived = spark.table("cur_stream_surv")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(survived == streamed.collect { case (id, t) if t._5 => id }.toSet)
  }

  test("token-free docs get a real REJECTED verdict, not a null one") {
    import spark.implicits._
    // the gate is a plain projection — exercise it as a batch frame.
    // n_tok = 0 makes the stopword term's ratio NULL, which `least`
    // SKIPS (so quality reads 0.5: length term 0, stopword term
    // saturated) — below any sane threshold, and the coalesce in
    // qualityGate guarantees a boolean verdict even if the score
    // expression ever returns NULL.
    val docs = Seq((1L, ""), (2L, "   "), (3L, Seq.fill(60)("the").mkString(" ")))
      .toDF("doc_id", "text")
    val got = CurationStream.qualityGate(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("quality"), r.getAs[Boolean]("admitted")))).toMap
    assert(got(1L) == ((0.5, false)) && got(2L) == ((0.5, false)),
      s"empty docs must be rejected: $got")
    assert(got(3L)._2, "the stopword-dense doc must be admitted")
    val surv = CurationStream.survivorDocs(docs)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(surv == Set(3L))
  }

  test("the ingest chain composes: gate -> dedup and gate -> LM score in one streaming DAG") {
    import spark.implicits._
    import org.apache.spark.sql.functions.round
    implicit val sqlCtx = spark.sqlContext
    // the incremental-dedup ingest slice (doc_id % 5 == 0), quality-gated
    // at the door — downstream stages must see only survivors
    val ingest = graft.core.Tables(spark, dir).documents
      .filter($"doc_id" % 5 === 0)
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val admitted = graft.SparkEntry.queries("tx_quality_lang")(spark, dir)
      .filter($"quality" >= 0.7)
      .collect().map(_.getAs[Long]("doc_id")).toSet
      .intersect(ingest.map(_._1).toSet)
    // the gate must split this slice both ways or the chain proves nothing
    assert(admitted.nonEmpty && admitted.size < ingest.size)

    // chain 1: gate -> minhash dedup (stream-static joins + stateful
    // collapse DOWNSTREAM of the gate projection)
    val in = MemoryStream[(Long, String)]
    val gated = CurationStream.survivorDocs(in.toDS().toDF("doc_id", "text"))
    val q1 = DedupStream.matches(gated, spark, dir)
      .writeStream.format("memory").queryName("chain_dedup")
      .outputMode("append").start()
    // chain 2: the SAME memory stream feeds gate -> LM scoring (each
    // query tracks its own offsets — one ingest, two consumers)
    val gated2 = CurationStream.survivorDocs(in.toDS().toDF("doc_id", "text"))
    val q2 = LmScoreStream.scores(gated2, spark, dir)
      .writeStream.format("memory").queryName("chain_lm")
      .outputMode("append").start()
    val cut = ingest.length / 2
    in.addData(ingest.take(cut): _*)
    q1.processAllAvailable(); q2.processAllAvailable()
    in.addData(ingest.drop(cut): _*)
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()

    // chain 1 == the batch composition: incremental matches whose new
    // side survived the gate
    val chainDedup = spark.table("chain_dedup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batchDedup = graft.queries.Dedup.incrementalMatches(spark, dir)
      .filter($"ni".isin(admitted.toSeq: _*))
      .select($"ni", $"oi", round($"jac", 6).as("jac"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(chainDedup == batchDedup)
    assert(chainDedup.nonEmpty)
    assert(chainDedup.forall(m => admitted.contains(m._1)))

    // chain 2 == the batch composition: LM scores of the gated slice
    val chainLm = spark.table("chain_lm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batchLm = graft.SparkEntry.queries("tx_unigram_logprob")(spark, dir)
      .filter($"doc_id".isin(admitted.toSeq: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(chainLm == batchLm)
    assert(chainLm.nonEmpty)
  }

  test("the ingest chain composes: gate -> NB classifier verdicts for every admitted doc") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ingest = graft.core.Tables(spark, dir).documents
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val admitted = graft.SparkEntry.queries("tx_quality_lang")(spark, dir)
      .filter($"quality" >= 0.7)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(admitted.nonEmpty && admitted.size < ingest.size)

    val in = MemoryStream[(Long, String)]
    val gated = CurationStream.survivorDocs(in.toDS().toDF("doc_id", "text"))
    val q = NbScoreStream.scores(gated, spark, dir)
      .writeStream.format("memory").queryName("chain_nb")
      .outputMode("append").start()
    val cut = ingest.length / 2
    Seq(ingest.take(cut), ingest.drop(cut))
      .foreach { chunk => in.addData(chunk: _*); q.processAllAvailable() }
    q.stop()

    val chain = spark.table("chain_nb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // exactly the admitted docs get verdicts (gate upstream, no loss,
    // no leak-through) — admitted docs always have tokens
    assert(chain.map(_._1).toSet == admitted)
    // and on the held-out split the verdicts are the batch query's rows
    val heldOut = chain.filter(_._1 % 3 == 0).toSet
    val batch = graft.SparkEntry.queries("tx_nb_score")(spark, dir)
      .filter($"doc_id".isin(admitted.toSeq: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(heldOut == batch)
    assert(heldOut.nonEmpty)
  }
}
