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
}
