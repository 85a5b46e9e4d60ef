package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.requiredConfs
      .foldLeft(SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_scale10d")) {
      graft.queries.Retrieval.clearCaches(); graft.queries.TextAnalysis.clearCaches()
      for (w <- Seq(0, 1, 6); p <- Seq(250, 1000)) {
        val rec = graft.queries.Retrieval.qlRecallAt(spark, dir, p, w)
          .agg((sum($"n_common") / sum($"n_exact")).as("r")).collect()(0).getDouble(0)
        println(f"""{"dir": "$dir", "w": $w, "p": $p, "recall_at10": $rec%.3f}""")
      }
    }
    spark.stop()
  }
}
