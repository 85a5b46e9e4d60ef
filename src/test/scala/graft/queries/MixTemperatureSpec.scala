package graft.queries

import graft.SparkSpec

/** Pins the temperature-mixture meter's defining properties: shares are
  * proper distributions, and α < 1 compresses toward uniform — the
  * scarcest language gets boosted (> 1) and the most abundant damped
  * (< 1). Exact values are hash-pinned by the DuckDB oracle.
  */
class MixTemperatureSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("tx_mix_temperature: shares sum to 1; boost ordering inverts abundance") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val rows = TextAnalysis.queries("tx_mix_temperature")(spark, dir).collect()
    assert(rows.length >= 2, "needs at least two languages to mix")
    val natSum = rows.map(_.getDouble(2)).sum
    val tempSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(natSum - 1.0) < 1e-3, s"nat shares sum to $natSum")
    assert(math.abs(tempSum - 1.0) < 1e-3, s"temp shares sum to $tempSum")
    val byTok = rows.sortBy(_.getLong(1))
    val scarcest = byTok.head
    val abundant = byTok.last
    info(s"scarcest=${scarcest.getString(0)} boost=${scarcest.getDouble(4)}; " +
      s"abundant=${abundant.getString(0)} boost=${abundant.getDouble(4)}")
    assert(scarcest.getDouble(4) > 1.0, "scarce language must be up-weighted")
    assert(abundant.getDouble(4) < 1.0, "abundant language must be down-weighted")
    // monotone: boost strictly decreases as abundance increases
    val boosts = byTok.map(_.getDouble(4))
    assert(boosts.zip(boosts.tail).forall { case (a, b) => a >= b },
      "boost must be non-increasing in language size")
  }
}
