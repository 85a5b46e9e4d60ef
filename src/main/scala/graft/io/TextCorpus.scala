package graft.io

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.KV

/** E1 whole-file text source + E7 "key value" line sink
  * (ref: mr/worker.go:194-206 read; mr/worker.go:115 write).
  *
  * One record per whole file, filename (basename) = key, contents = value —
  * the record shape the reference feeds to Map. Reads via the `binaryFile`
  * source (decoded UTF-8) rather than `text`+`wholetext`: same distributed
  * one-task-per-file shape, chosen so zero-length files can be recovered
  * from the same listing (below). The filename comes from the source's
  * `path` column.
  */
object TextCorpus {

  /** @param glob optional filename glob (e.g. "pg-*.txt") restricting the
    *   corpus to matching files — the Spark-side analogue of the shell
    *   glob the reference's driver receives (main/mrmaster.go:15-23).
    */
  def read(spark: SparkSession, dir: String, glob: Option[String] = None): Dataset[(String, String)] = {
    import spark.implicits._
    val reader = spark.read.format("binaryFile")
    val nonEmpty = glob.fold(reader)(g => reader.option("pathGlobFilter", g)).load(dir)
      .select(
        element_at(split($"path", "/"), -1).as("file"),
        decode($"content", "UTF-8").as("contents"))
      .as[(String, String)]
    // Spark's file sources produce no rows for zero-length files, but the
    // reference calls Map on them too (mr/worker.go:54-60). File listing
    // is driver-side metadata in Spark regardless; recover empty files
    // from it and union them in as ("name", "") records.
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val globFilter = glob.map(g => new org.apache.hadoop.fs.GlobFilter(g))
    val empties = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(st => st.isFile && st.getLen == 0 &&
        globFilter.forall(_.accept(st.getPath)))
      .map(st => (st.getPath.getName, ""))
      .toSeq
    if (empties.isEmpty) nonEmpty
    else nonEmpty.union(spark.createDataset(empties))
  }

  /** Emit `"<key> <value>"` lines (Go `%v %v`, main/mrsequential.go:81). */
  def writeLines(ds: Dataset[KV], out: String): Unit = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map(kv => s"${kv.key} ${kv.value}").write.mode("overwrite").text(out)
  }

  /** Format as lines without writing — used by golden-diff tests. */
  def formatLines(ds: Dataset[KV]): Dataset[String] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map(kv => s"${kv.key} ${kv.value}")
  }
}
