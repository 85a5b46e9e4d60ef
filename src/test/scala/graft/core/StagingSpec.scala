package graft.core

import java.nio.file.Files

import graft.SparkSpec

/** Contract of the durable staged-index store ([[Staging]]):
  *  - an artifact is WRITTEN on first build and READ (same values) after,
  *  - a corpus regeneration (content change) MISSES — staging must never
  *    serve a previous generation's index against new data (the driver
  *    rewrites /root/testdata between rounds),
  *  - superseded generations are pruned,
  *  - staging failures degrade to the in-memory build, never to an error.
  */
class StagingSpec extends SparkSpec {
  import spark.implicits._

  private def writeCorpus(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

  test("read-else-build stages once, then serves identical values") {
    assume(Staging.enabled, "staging disabled in this JVM")
    val dir = Files.createTempDirectory("staging_spec").toString
    writeCorpus(dir, (0L until 20L).map(i => (i, s"alpha beta gamma delta eps w$i x$i y$i z$i")))
    try {
      var builds = 0
      def once() = Staging.readElseBuild(spark, dir, "probe", Seq("documents")) {
        builds += 1
        spark.read.parquet(s"$dir/documents.parquet")
          .selectExpr("doc_id", "length(text) AS len")
      }
      val first = once().collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val second = once().collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(builds == 1, "second call must hit the staged copy, not rebuild")
      assert(first == second)
      assert(first.size == 20)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("a regenerated corpus misses the stale artifact and prunes it") {
    assume(Staging.enabled, "staging disabled in this JVM")
    val dir = Files.createTempDirectory("staging_gen").toString
    try {
      writeCorpus(dir, Seq((1L, "first generation text")))
      def count() = Staging.readElseBuild(spark, dir, "probe", Seq("documents")) {
        spark.read.parquet(s"$dir/documents.parquet").selectExpr("doc_id")
      }.count()
      assert(count() == 1)
      // regenerate with different content (different size => different
      // fingerprint even within one mtime tick)
      writeCorpus(dir, (0L until 5L).map(i => (i, s"second generation doc $i")))
      assert(count() == 5, "stale staged artifact served after corpus regeneration")
      // exactly one generation dir remains for this corpus slug
      val slugPrefix = java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString
        .replaceAll("[^A-Za-z0-9.]+", "_").replaceAll("^_+", "").take(80)
      import scala.jdk.CollectionConverters._
      val gens = Files.list(java.nio.file.Paths.get(Staging.root)).iterator().asScala
        .filter(_.getFileName.toString.startsWith(slugPrefix + "-")).toSeq
      assert(gens.size == 1, s"superseded generation not pruned: $gens")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("concurrent builders race to one staged artifact with identical values") {
    assume(Staging.enabled, "staging disabled in this JVM")
    val dir = Files.createTempDirectory("staging_race").toString
    writeCorpus(dir, (0L until 30L).map(i => (i, s"race doc number $i body")))
    try {
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Set[Long]]()
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def run(): Unit =
        try results.add(
          Staging.readElseBuild(spark, dir, "race_probe", Seq("documents")) {
            spark.read.parquet(s"$dir/documents.parquet").selectExpr("doc_id")
          }.collect().map(_.getLong(0)).toSet)
        catch { case t: Throwable => errors.add(t) }
      val threads = (1 to 2).map(_ => new Thread(() => run()))
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errors.isEmpty, s"racing builder threw: ${errors.peek()}")
      import scala.jdk.CollectionConverters._
      val rs = results.asScala.toSeq
      assert(rs.size == 2 && rs.forall(_ == (0L until 30L).toSet))
      // exactly one committed artifact, no leftover temp dirs
      val slug = java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString
        .replaceAll("[^A-Za-z0-9.]+", "_").replaceAll("^_+", "").take(80)
      val gen = Files.list(java.nio.file.Paths.get(Staging.root)).iterator().asScala
        .filter(_.getFileName.toString.startsWith(slug + "-")).toSeq
      assert(gen.size == 1)
      val entries = Files.list(gen.head).iterator().asScala
        .map(_.getFileName.toString).toSeq
      assert(entries.count(_ == "race_probe") == 1)
      assert(!entries.exists(_.contains(".tmp-")), s"leftover temp: $entries")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("staged artifacts reproduce the unstaged results across every family") {
    assume(Staging.enabled, "staging disabled in this JVM")
    // one corpus queried twice through the staging layer: cold
    // (build+write) then — after dropping every session memo but keeping
    // disk — warm (read-back). Warm results must equal cold results
    // value-for-value for a query from each staged family: minhash
    // bands, prefix pair tables, simhash bands, window index, cluster
    // labels, token accounting, curation survivors, media table.
    val dir = Files.createTempDirectory("staging_dedup").toString
    // full driver-table schema: tx_* needs lang, mm_* needs source
    locally {
      (0L until 40L).map { i =>
        val base = s"the quick brown fox jumps over lazy dog number ${i % 7} again and again"
        val text = if (i % 3 == 0) base else base + s" tail $i"
        (i, text, if (i % 5 == 0) "de" else "en", s"src${i % 3}", text.length)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    // small embeddings table so the ANN/PQ family participates
    locally {
      import org.apache.spark.sql.functions._
      val r = new scala.util.Random(5)
      (0L until 64L).map { i =>
        (i, Array.tabulate(256)(d => (r.nextGaussian() + (i % 4) * 2.0).toFloat), (i % 4).toInt)
      }.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    val families = Seq("dedup_minhash_lsh", "dedup_jaccard_prefix",
      "dedup_simhash", "dedup_substring", "dedup_clusters",
      "tx_curation_packed", "tx_pack", "tx_unigram_logprob",
      "tx_dsir_weights", "tx_bigram_logprob", "tx_bpe_segment",
      "mm_features", "ann_pq_codes", "ann_pca_project")
    def clearAll(): Unit = {
      graft.queries.Dedup.clearCaches()
      graft.queries.Similarity.clearCaches()
      graft.queries.TextAnalysis.clearCaches()
      graft.multimodal.Multimodal.clearCaches()
      graft.queries.KvQueries.clearCaches()
      graft.queries.MultimodalQueries.clearCaches()
      graft.queries.Retrieval.clearCaches()
    }
    try {
      clearAll()
      val cold = families.map(q =>
        q -> graft.SparkEntry.queries(q)(spark, dir)
          .collect().map(_.toString).sorted.toSeq).toMap
      clearAll() // drop session memos, keep disk
      families.foreach { q =>
        val warm = graft.SparkEntry.queries(q)(spark, dir)
          .collect().map(_.toString).sorted.toSeq
        assert(cold(q) == warm, s"staged read-back changed $q results")
        assert(warm.nonEmpty || cold(q).isEmpty)
      }
    } finally {
      clearAll()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
