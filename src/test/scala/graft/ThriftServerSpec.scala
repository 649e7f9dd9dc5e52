package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.cube.GraftSql

/** The full serving story, end to end: an EXTERNAL client on the
  * standard Hive JDBC protocol (any BI tool) connects to Spark's
  * Thriftserver bound to the graft session and gets transparent cube
  * acceleration — the acceleration rule rewrites the client's plain
  * SQL during analysis, no graft API anywhere in the client. This is
  * the reference's query-server deployment (Kylin serves JDBC/ODBC
  * over its query engine) assembled from stock Spark parts:
  * HiveThriftServer2 + SparkSessionExtensions + the router. */
class ThriftServerSpec extends AnyFunSuite {
  import TestSpark._

  test("a JDBC client through Thriftserver is served from the cube " +
      "when acceleration is on") {
    GraftSql.registerViews(spark, sf)
    cube.CubeManager.ensureBuilt(spark, sf)
    val port = {
      val ss = new java.net.ServerSocket(0)
      try ss.getLocalPort finally ss.close()
    }
    // singleSession + metastore location are static confs set in
    // TestSpark's builder; the port is a hive conf (runtime-settable)
    spark.conf.set("hive.server2.thrift.port", port.toString)
    spark.conf.set("spark.graft.accelerate", "true")
    // startWithContext flips the session to the java.time API
    // (SPARK-31859) — remember the setting so cleanup can restore it
    // for the suites that run after this one
    val java8Key = "spark.sql.datetime.java8API.enabled"
    val java8Before = spark.conf.getOption(java8Key)
    val server = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    try {
      // the server binds asynchronously — retry the connect briefly
      var conn: java.sql.Connection = null
      var attempts = 0
      while (conn == null && attempts < 30) {
        try conn = DriverManager.getConnection(
          s"jdbc:hive2://localhost:$port/default", "", "")
        catch { case _: Exception => attempts += 1; Thread.sleep(1000) }
      }
      assert(conn != null, s"could not connect to thriftserver on $port")
      val stmt = conn.createStatement()
      val q = "SELECT n_name, count(*) AS n FROM graft_star " +
        "WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name"
      // the plan the server executes reads cuboid parquet, not the
      // fact table: acceleration reached the JDBC path
      val er = stmt.executeQuery(s"EXPLAIN EXTENDED $q")
      val sb = new StringBuilder
      while (er.next()) sb.append(er.getString(1)).append('\n')
      val planText = sb.toString
      assert(planText.contains("cuboid="),
        s"JDBC plan must read cuboids, got:\n${planText.take(800)}")
      assert(!planText.contains("lineitem.parquet"),
        "JDBC plan must not rescan the fact table")
      // and the values match the un-accelerated session answer
      val rs = stmt.executeQuery(q)
      val got = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      while (rs.next()) got += (rs.getString(1) -> rs.getLong(2))
      spark.conf.set("spark.graft.accelerate", "false")
      val want = spark.sql(q).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSeq
      assert(got.toSeq == want && want.nonEmpty,
        s"JDBC answer must match: $got vs $want")
      conn.close()
    } finally {
      spark.conf.set("spark.graft.accelerate", "false")
      scala.util.Try(server.stop())
      java8Before match {
        case Some(v) => spark.conf.set(java8Key, v)
        case None => spark.conf.unset(java8Key)
      }
    }
  }
}
