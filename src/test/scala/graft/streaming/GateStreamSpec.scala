package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The streaming admission gate must (a) reproduce the batch sampler's
  * selection exactly when fed in the canonical md5 order, and (b) never
  * exceed a source's budget however arrivals split across micro-batches.
  */
class GateStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("md5-ordered feed reproduces gr_rank_sample exactly across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the canonical order the batch sampler draws in
    val arrivals = graft.core.Tables(spark, dir).documents
      .select($"doc_id", $"source",
        org.apache.spark.sql.functions.md5($"doc_id".cast("string")).as("d"))
      .orderBy($"d", $"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val got = mutable.Buffer.empty[(Long, String)]
    val in = MemoryStream[(Long, String)]
    val q = GateStream.admitted(in.toDS().toDF("doc_id", "source"), spark, dir)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[GateStream.Admitted], _: Long) =>
        got ++= b.collect().map(a => (a.doc_id, a.source)); ()
      }
      .queryName("gate_admit").start()
    arrivals.grouped(math.max(1, arrivals.size / 3)).foreach { chunk =>
      in.addData(chunk: _*); q.processAllAvailable()
    }
    q.stop()

    val batch = graft.SparkEntry.queries("gr_rank_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.toSet == batch)
    assert(got.size == got.toSet.size)
  }

  test("budgets are never exceeded regardless of arrival split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val budgets = graft.queries.GraphRank.rankGate(spark, dir)
      .select($"source", $"budget")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // adversarial feed: unsorted, all at once then a duplicate-heavy tail
    val docs = graft.core.Tables(spark, dir).documents
      .select($"doc_id", $"source")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val got = mutable.Buffer.empty[(Long, String)]
    val in = MemoryStream[(Long, String)]
    val q = GateStream.admitted(in.toDS().toDF("doc_id", "source"), spark, dir)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[GateStream.Admitted], _: Long) =>
        got ++= b.collect().map(a => (a.doc_id, a.source)); ()
      }
      .queryName("gate_budget").start()
    in.addData(docs: _*); q.processAllAvailable()
    q.stop()

    val perSrc = got.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    perSrc.foreach { case (src, n) =>
      assert(n <= budgets.getOrElse(src, 0L), s"$src over budget: $n")
    }
    assert(got.nonEmpty)
  }

  test("generation-bound admission reproduces gr_rank_sample and cuts over " +
      "to a republished budget set on the very next batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_gate_gen").toString
    graft.queries.GraphRank.writeGateGeneration(spark, dir, root)

    val arrivals = graft.core.Tables(spark, dir).documents
      .select($"doc_id", $"source",
        org.apache.spark.sql.functions.md5($"doc_id".cast("string")).as("d"))
      .orderBy($"d", $"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val got = mutable.Buffer.empty[(Long, String)]
    val in = MemoryStream[(Long, String)]
    val q = GateStream.admittedLatest(in.toDS().toDF("doc_id", "source"),
      root, s"$root/ledger") { b =>
      got ++= b.collect().map(a => (a.doc_id, a.source)); ()
    }.queryName("gate_admit_latest").start()
    arrivals.grouped(math.max(1, arrivals.size / 3)).foreach { chunk =>
      in.addData(chunk: _*); q.processAllAvailable()
    }

    // parity with the batch sampler under the corpus's own gate generation
    val batch = graft.SparkEntry.queries("gr_rank_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.toSet == batch)

    // drain any residual room (a source whose n_docs < budget never fills
    // its counter from one pass of its own docs), so the cutover phase
    // starts from room == 0 everywhere
    var prev = -1
    while (got.size != prev) {
      prev = got.size
      in.addData(arrivals: _*); q.processAllAvailable()
    }

    // republish: ONE source's budget raised by 3, committed as gen-2 —
    // the very next batch (no restart) must admit exactly 3 docs, all
    // from that source
    val gate = graft.queries.GraphRank.rankGate(spark, dir)
      .select($"source", $"budget", $"n_docs")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bumped = gate.maxBy(_._3)._1
    val b2 = gate.map { case (src, b, _) =>
      (src, if (src == bumped) b + 3 else b)
    }.toSeq.toDF("source", "budget")
    graft.queries.GraphRank.commitGateGeneration(b2, root)
    val before = got.size
    in.addData(arrivals: _*); q.processAllAvailable()
    q.stop()
    val fresh = got.drop(before)
    assert(fresh.size == 3, s"expected 3 cutover admissions, got ${fresh.size}")
    assert(fresh.forall(_._2 == bumped), s"cutover admitted outside $bumped: $fresh")
  }

  test("generation-bound admission survives a query restart: the ledger " +
      "recovers the counters, no budget re-opens, and the split run's " +
      "admissions equal the uninterrupted run's") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_gate_restart").toString
    graft.queries.GraphRank.writeGateGeneration(spark, dir, root)
    val ledger = s"$root/ledger"

    val arrivals = graft.core.Tables(spark, dir).documents
      .select($"doc_id", $"source",
        org.apache.spark.sql.functions.md5($"doc_id".cast("string")).as("d"))
      .orderBy($"d", $"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (head, tail) = arrivals.splitAt(arrivals.size / 2)
    val (h1, h2) = head.splitAt(head.size / 2)

    def runQuery(feed: Seq[Seq[(Long, String)]],
        got: mutable.Buffer[(Long, String)]): Unit = {
      val in = MemoryStream[(Long, String)]
      val q = GateStream.admittedLatest(in.toDS().toDF("doc_id", "source"),
        root, ledger) { b =>
        got ++= b.collect().map(a => (a.doc_id, a.source)); ()
      }.queryName("gate_restart").start()
      feed.foreach { chunk => in.addData(chunk: _*); q.processAllAvailable() }
      q.stop()
    }

    // first run admits the head over two micro-batches, then the query
    // DIES (stop); the second run is a NEW query (fresh driver state)
    // fed the tail PLUS a full replay of everything — without the
    // ledger it would re-admit every budget from zero
    val got = mutable.Buffer.empty[(Long, String)]
    runQuery(Seq(h1, h2), got)
    assert(got.nonEmpty)
    runQuery(Seq(tail, arrivals), got)

    val budgets = graft.queries.GraphRank.rankGate(spark, dir)
      .select($"source", $"budget")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perSrc = got.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    perSrc.foreach { case (src, n) =>
      assert(n <= budgets.getOrElse(src, 0L),
        s"$src over budget after restart: $n")
    }
    // set-parity with the uninterrupted batch sampler — the split run
    // admitted exactly the canonical selection, no duplicates
    val batch = graft.SparkEntry.queries("gr_rank_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.toSet == batch)
    assert(got.size == got.toSet.size, "restart re-admitted a document")
  }

  test("cross-form equivalence: admitted and admittedLatest make identical " +
      "decisions on the same feed under the same budgets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_gate_xform").toString
    // admittedLatest bound to the corpus's own committed gate generation
    // == admitted's session budgets (writeGateGeneration commits rankGate)
    graft.queries.GraphRank.writeGateGeneration(spark, dir, root)

    // adversarial feed: NOT in canonical order, split unevenly — both
    // forms must still pick the same per-source md5-order prefixes
    val docs = graft.core.Tables(spark, dir).documents
      .select($"doc_id", $"source")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val chunks = docs.grouped(math.max(1, docs.size / 4)).toSeq

    val gotFixed = mutable.Buffer.empty[(Long, String)]
    val inF = MemoryStream[(Long, String)]
    val qF = GateStream.admitted(inF.toDS().toDF("doc_id", "source"), spark, dir)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[GateStream.Admitted], _: Long) =>
        gotFixed ++= b.collect().map(a => (a.doc_id, a.source)); ()
      }
      .queryName("gate_xform_fixed").start()
    chunks.foreach { c => inF.addData(c: _*); qF.processAllAvailable() }
    qF.stop()

    val gotLatest = mutable.Buffer.empty[(Long, String)]
    val inL = MemoryStream[(Long, String)]
    val qL = GateStream.admittedLatest(inL.toDS().toDF("doc_id", "source"),
      root, s"$root/ledger") { b =>
      gotLatest ++= b.collect().map(a => (a.doc_id, a.source)); ()
    }.queryName("gate_xform_latest").start()
    chunks.foreach { c => inL.addData(c: _*); qL.processAllAvailable() }
    qL.stop()

    assert(gotFixed.toSet == gotLatest.toSet,
      "the two admission forms diverged on the same feed and budgets")
    assert(gotFixed.size == gotLatest.size)
  }

  test("the epoch-0 collision: a fresh-checkpoint restart whose previous " +
      "incarnation committed exactly one epoch (numbered 0) continues the " +
      "campaign instead of re-opening the spent budgets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_gate_e0").toString
    graft.queries.GraphRank.writeGateGeneration(spark, dir, root)
    val ledger = s"$root/ledger"

    val arrivals = graft.core.Tables(spark, dir).documents
      .select($"doc_id", $"source",
        org.apache.spark.sql.functions.md5($"doc_id".cast("string")).as("d"))
      .orderBy($"d", $"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    def runOnce(feed: Seq[(Long, String)],
        got: mutable.Buffer[(Long, String)], name: String): Unit = {
      val in = MemoryStream[(Long, String)]
      val q = GateStream.admittedLatest(in.toDS().toDF("doc_id", "source"),
        root, ledger) { b =>
        got ++= b.collect().map(a => (a.doc_id, a.source)); ()
      }.queryName(name).start()
      in.addData(feed: _*); q.processAllAvailable() // exactly ONE epoch: 0
      q.stop()
    }

    // incarnation 1 admits the whole canonical feed in a single
    // micro-batch, so the ledger records epoch 0 and nothing else —
    // exactly the corner the (dir, epoch)-only format could not see
    val got1 = mutable.Buffer.empty[(Long, String)]
    runOnce(arrivals, got1, "gate_e0_first")
    assert(got1.nonEmpty)

    // incarnation 2 (fresh query, fresh checkpoint, epochs restart at 0)
    // replays the same arrivals: every budget is already spent, so it
    // must admit NOTHING — the old rule read pre and re-admitted got1
    val got2 = mutable.Buffer.empty[(Long, String)]
    runOnce(arrivals, got2, "gate_e0_second")
    assert(got2.isEmpty,
      s"fresh-checkpoint restart re-admitted ${got2.size} docs at epoch 0")

    // and the first incarnation's selection is the batch sampler's
    val batch = graft.SparkEntry.queries("gr_rank_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got1.toSet == batch)
  }
}
