package graft.queries

import scala.util.Random

import graft.SparkSpec

/** Property check for q_interval_join against an in-memory brute force.
  *
  * The query decomposes the inequality predicate `click ∈ [err−6h, err)`
  * into an equi join: bin width == window width, error side exploded into
  * {bin−1, bin}. That algebra only works while the two widths stay equal
  * and the boundary conventions (closed left, open right) survive — the
  * DuckDB oracle pins the query on the real corpus, where timestamps
  * essentially never land on exact boundaries; this spec pins the bin
  * algebra against adversarial placements: clicks exactly AT err−6h
  * (included), one microsecond before (excluded), at err (excluded), one
  * microsecond before err (included), and events sitting precisely on bin
  * edges.
  */
class IntervalJoinSpec extends SparkSpec {

  private val W = 6L * 3600L * 1000000L // 6 h in micros == the bin width

  /** (err_id, n_clicks, first_click_us, last_click_us) per error with ≥1
    * click in its window — the query's contract, recomputed naively.
    */
  private def brute(
      rows: Seq[(Long, Long, Long, String)]): Set[(Long, Long, Long, Long)] = {
    val errs   = rows.filter(_._4 == "error")
    val clicks = rows.filter(_._4 == "click")
    errs.flatMap { case (id, t, u, _) =>
      val in = clicks.collect {
        case (_, ct, cu, _) if cu == u && ct >= t - W && ct < t => ct
      }
      if (in.isEmpty) None else Some((id, in.size.toLong, in.min, in.max))
    }.toSet
  }

  test("bin-join == inequality join on boundary-adversarial data") {
    import spark.implicits._
    val rnd  = new Random(7)
    val base = 1704067200000000L // 2024-01-01 UTC in micros (bin-aligned)
    // Random events for 7 users, with timestamps biased onto bin edges
    // and edge±1 so every boundary convention is exercised.
    val random = (0L until 400L).map { i =>
      val edge = base + rnd.nextInt(120).toLong * W
      val t = rnd.nextInt(4) match {
        case 0 => base + math.abs(rnd.nextLong() % (120L * W))
        case 1 => edge
        case 2 => edge + W - 1
        case _ => edge + 1
      }
      (i, t, i % 7, if (i % 2 == 0) "error" else "click")
    }
    // Planted exact-window boundaries for a dedicated user: the window is
    // closed at err−W and open at err.
    val t0 = base + 50L * W + 1234L
    val planted = Seq(
      (1000L, t0, 99L, "error"),
      (1001L, t0 - W, 99L, "click"),     // exactly err−6h → included
      (1002L, t0 - W - 1L, 99L, "click"), // 1 µs earlier → excluded
      (1003L, t0 - 1L, 99L, "click"),    // 1 µs before err → included
      (1004L, t0, 99L, "click"))         // exactly at err → excluded
    val rows = random ++ planted

    val dir = java.nio.file.Files.createTempDirectory("ivj_prop").toString
    rows.toDF("event_id", "ts_us", "user_id", "event_type")
      .selectExpr("event_id", "ts_us * 1000 AS ts", "user_id", "event_type",
        "1.0 AS value", "'{}' AS props") // nanos long, as Tables.events reads
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    try {
      val got = graft.SparkEntry.queries("q_interval_join")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = brute(rows)
      assert(got == want, s"missing=${want -- got} extra=${got -- want}")
      assert(want.exists(_._1 == 1000L), "planted error must have clicks")
      assert(want.find(_._1 == 1000L).get == ((1000L, 2L, t0 - W, t0 - 1L)),
        "boundary clicks: err−6h in, err−6h−1µs out, err−1µs in, err out")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
