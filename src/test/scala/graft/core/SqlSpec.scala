package graft.core

import graft.SparkSpec

/** The SQL front end must agree with the DataFrame formulations, and the
  * custom fnv1a32 function must be callable from SQL text.
  */
class SqlSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("SQL text q1 aggregation equals the DataFrame q1_agg") {
    val viaSql = Sql.sql(spark, dir,
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(_.toSeq).toSeq
    val viaDf = graft.SparkEntry.queries("q1_agg")(spark, dir)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect().map(_.toSeq).toSeq
    assert(viaSql == viaDf)
  }

  test("custom fnv1a32 is callable from SQL text") {
    val rows = Sql.sql(spark, dir,
      "SELECT fnv1a32('a') AS h, fnv1a32(l_returnflag) IS NOT NULL AS ok FROM lineitem LIMIT 1")
      .collect()
    assert(rows.head.getLong(0) == (0xe40c292cL & 0x7fffffffL))
    assert(rows.head.getBoolean(1))
  }

  test("SQL join + window over registered views") {
    val n = Sql.sql(spark, dir,
      """SELECT * FROM (
        |  SELECT o_orderkey, c_name,
        |    ROW_NUMBER() OVER (PARTITION BY c_name ORDER BY o_orderkey) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rn = 1""".stripMargin).count()
    assert(n > 0)
  }
}
