package graft.functions

import graft.SparkSpec

class SaltingSpec extends SparkSpec {

  test("salted join equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) s"k$i" else "HOT", i))
      .toDF("k", "v").repartition(4)
    val small = Seq(("HOT", "h"), ("k10", "a"), ("k20", "b"), ("nomatch", "z"))
      .toDF("k", "w")
    val plain = big.join(small, "k").select($"k", $"v", $"w")
      .collect().map(_.toSeq).toSet
    val salted = Salting.saltedJoin(big, small, "k", 8).select($"k", $"v", $"w")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.count(_.head == "HOT") == 1800)
  }

  test("salted join spreads a hot key across the (key, salt) space") {
    import spark.implicits._
    val big = (1 to 1000).map(i => ("HOT", i)).toDF("k", "v")
    // count distinct salts actually used on the big side
    val used = big.withColumn("s",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash($"k", $"v"),
        org.apache.spark.sql.functions.lit(8)))
      .select("s").distinct().count()
    assert(used >= 6, s"salt spread too narrow: $used of 8")
  }

  test("salted collect_list collects exactly the plain multiset per key") {
    import spark.implicits._
    val df = (1 to 500).map(i => (if (i % 5 == 0) "cold" + i else "HOT", i.toLong))
      .toDF("k", "v").repartition(4)
    val plain = df.groupBy($"k")
      .agg(org.apache.spark.sql.functions.collect_list($"v").as("vs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).sorted).toMap
    val salted = Salting.saltedCollectList(df, "k", "v", 8)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).sorted).toMap
    assert(salted == plain)
  }
}
