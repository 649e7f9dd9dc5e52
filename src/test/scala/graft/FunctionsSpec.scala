package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** The SQL-only user path: every measure function callable from
  * spark.sql via the graft_ registrations. */
class FunctionsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val ready: Unit = {
    GraftFunctions.register(spark)
    Tables.orders(spark, sf).createOrReplaceTempView("orders_v")
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem_v")
  }

  test("GraftSession.init wires the full surface in one call") {
    GraftSession.init(spark, sf)
    val (df, routed) = graft.cube.GraftSql.sql(spark, sf,
      "SELECT l_returnflag, count(*) AS n_rows FROM graft_star GROUP BY l_returnflag")
    assert(routed && df.count() > 0)
  }

  test("bitmap agg + count over SQL equals COUNT(DISTINCT)") {
    ready
    val got = spark.sql(
      """SELECT o_orderstatus,
        |  graft_bitmap_count(graft_bitmap_agg(o_custkey)) AS n
        |FROM orders_v GROUP BY o_orderstatus""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = spark.sql(
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n
        |FROM orders_v GROUP BY o_orderstatus""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && want.nonEmpty)
  }

  test("intersect_count in SQL matches an INTERSECT subquery") {
    ready
    val got = spark.sql(
      """SELECT graft_intersect_count(a.bm, b.bm) AS n FROM
        |  (SELECT graft_bitmap_agg(o_custkey) AS bm FROM orders_v
        |   WHERE o_orderstatus = 'F') a,
        |  (SELECT graft_bitmap_agg(o_custkey) AS bm FROM orders_v
        |   WHERE o_orderstatus = 'O') b""".stripMargin)
      .head().getLong(0)
    val want = spark.sql(
      """SELECT COUNT(*) FROM (
        |  SELECT DISTINCT o_custkey FROM orders_v WHERE o_orderstatus = 'F'
        |  INTERSECT
        |  SELECT DISTINCT o_custkey FROM orders_v WHERE o_orderstatus = 'O')""".stripMargin)
      .head().getLong(0)
    assert(got == want && want > 0)
  }

  test("native graft_md5_60 equals the SQL builtin hex formulation") {
    ready
    Tables.documents(spark, sf).createOrReplaceTempView("docs_v")
    val bad = spark.sql(
      """SELECT count(*) FROM docs_v
        |WHERE graft_md5_60(text)
        |  != CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)""".stripMargin)
      .head().getLong(0)
    assert(bad == 0L)
  }

  test("hll estimate within 5% of exact; kll median within the value range") {
    ready
    val r = spark.sql(
      """SELECT graft_hll_estimate(graft_hll_agg(o_custkey)) AS est,
        |  COUNT(DISTINCT o_custkey) AS exact,
        |  graft_kll_quantile(graft_kll_agg(o_totalprice), 0.5) AS p50,
        |  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders_v""".stripMargin).head()
    assert(math.abs(r.getLong(0) - r.getLong(1)) <= r.getLong(1) * 0.05)
    assert(r.getDouble(2) >= r.getDouble(3) && r.getDouble(2) <= r.getDouble(4))
  }
}
