package graft

import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cube._

/** VERDICT r7 items 6 (exact-match short-circuit — no re-aggregation
  * when the cuboid grain IS the query grain on one segment) and 7
  * (multi-realization choice — the cheapest covering cube answers,
  * Kylin's RealizationChooser). */
class RealizationSpec extends AnyFunSuite {
  import TestSpark._

  private def nAggregates(r: Routed): Int =
    r.df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.size

  private val exactQ = CubeQuery(
    Seq("o_orderstatus", "l_returnflag"),
    Seq("revenue" -> "revenue", "nrows" -> "n_rows"))

  test("exact cuboid match on a single segment skips the re-agg groupBy") {
    val merged = CubeManager.ensureMerged(spark, sf)
    val r = QueryRouter.route(spark, merged, exactQ)(fail("expected cuboid"))
    assert(r.cuboid.contains(Set("o_orderstatus", "l_returnflag")))
    assert(nAggregates(r) == 0,
      s"single-segment exact match must not re-aggregate:\n" +
        r.df.queryExecution.optimizedPlan)
    // and the cells it presents are the real answer
    val want = QueryRouter.route(spark, CubeManager.ensureBuilt(spark, sf),
      exactQ)(fail("expected cuboid"))
      .df.collect().map(x => (x.getString(0), x.getString(1),
        x.getDouble(2), x.getLong(3))).toSet
    val got = r.df.collect().map(x => (x.getString(0), x.getString(1),
      x.getDouble(2), x.getLong(3))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("multi-segment or partial-match routes still aggregate exactly once") {
    val inst = CubeManager.ensureBuilt(spark, sf)
    // exact dims but 4 segments: states must merge across segments
    assert(nAggregates(QueryRouter.route(spark, inst, exactQ)(
      fail("expected cuboid"))) == 1)
    // coarser-than-cuboid query on the merged single segment: one re-agg
    val coarse = CubeQuery(Seq("l_returnflag"), Seq("revenue" -> "revenue"))
    assert(nAggregates(QueryRouter.route(spark,
      CubeManager.ensureMerged(spark, sf), coarse)(
      fail("expected cuboid"))) == 1)
  }

  test("a residual time filter disables the short-circuit") {
    // partial overlap forces the residual month filter; rows below the
    // cuboid grain must still merge
    val merged = CubeManager.ensureMerged(spark, sf)
    val r = QueryRouter.route(spark, merged, CubeQuery(
      Seq("o_orderstatus"), Seq("nrows" -> "n_rows"),
      timeRange = Some(("1996-01-01", "1999-07-01"))))(fail("expected cuboid"))
    assert(nAggregates(r) == 1)
    val srcN = CubeManager.flatTable(spark, sf)
      .filter("o_orderdate >= '1996-01-01' and o_orderdate < '1999-07-01'")
      .count()
    assert(r.df.agg(sum("n_rows")).head().getLong(0) == srcN)
  }

  // ── multi-realization ──────────────────────────────────────────────

  private lazy val narrowRoot =
    java.nio.file.Files.createTempDirectory("graft-narrow").toString

  /** a second, narrower realization over the same star model: 2 dims,
    * the basic measures only — far fewer cuboid rows on the queries it
    * covers (the reference registers many cubes per model and chooses
    * per query) */
  private lazy val narrowInst: CubeInstance = {
    val wide = CubeManager.defaultCube
    val dims = Seq("o_orderstatus", "l_returnflag")
    val cube = wide.copy(
      name = "star_narrow",
      dims = dims,
      measures = wide.measures.filter(m =>
        Set("revenue", "qty", "nrows").contains(m.name)),
      cuboids = Seq(dims.toSet, Set("l_returnflag")),
      shardBy = None, derived = Nil, extended = Nil)
    CubeBuilder.build(spark, CubeManager.flatTable(spark, sf), cube,
      narrowRoot)
  }

  test("the cheapest covering realization answers; wide covers the rest") {
    val wide = CubeManager.ensureBuilt(spark, sf)
    val insts = Seq(wide, narrowInst)

    // covered by both: the narrow cube's cuboid is smaller → it wins
    val q1 = CubeQuery(Seq("l_returnflag"),
      Seq("revenue" -> "revenue", "nrows" -> "n_rows"))
    val (r1, win1) = QueryRouter.routeBest(spark, insts, q1)(
      fail("expected cuboid"))
    assert(win1.exists(_.cube.name == "star_narrow"),
      s"narrow realization must win, got ${win1.map(_.cube.name)}")
    assert(r1.df.inputFiles.forall(_.contains(narrowRoot)))
    // and the answer matches the wide cube's
    val wideAnswer = QueryRouter.route(spark, wide, q1)(fail("cuboid"))
      .df.collect().map(x => (x.getString(0), x.getDouble(1), x.getLong(2)))
      .toSet
    assert(r1.df.collect().map(x => (x.getString(0), x.getDouble(1),
      x.getLong(2))).toSet == wideAnswer)

    // dim the narrow cube lacks → wide answers
    val (r2, win2) = QueryRouter.routeBest(spark, insts,
      CubeQuery(Seq("n_name"), Seq("revenue" -> "revenue")))(
      fail("expected cuboid"))
    assert(win2.exists(_.cube.name == "star") && !r2.fallback)

    // measure the narrow cube lacks → wide answers even on narrow dims
    val (r3, win3) = QueryRouter.routeBest(spark, insts,
      CubeQuery(Seq("l_returnflag"), Seq("cust_bitmap" -> "n_cust")))(
      fail("expected cuboid"))
    assert(win3.exists(_.cube.name == "star") && !r3.fallback)

    // covered by neither → clean fallback
    var fb = false
    val (r4, win4) = QueryRouter.routeBest(spark, insts,
      CubeQuery(Seq("no_such_dim"), Seq("revenue" -> "r"))) {
      fb = true; spark.emptyDataFrame
    }
    assert(r4.fallback && fb && win4.isEmpty)
  }

  test("the SQL front-end picks the cheapest realization per query") {
    val wideRoot = CubeManager.ensureBuilt(spark, sf).root
    narrowInst // force the narrow build before registering
    GraftSql.registerBinding(GraftSql.Binding("graft_star_mr",
      CubeManager.flatTable, CubeManager.ensureBuilt,
      alternates = Seq((_, _) => narrowInst)))

    // both cover: the narrow realization's cuboid is smaller → it wins
    val r1 = GraftSql.sqlVia(spark, sf,
      """SELECT l_returnflag, sum(disc_price) AS revenue, count(*) AS n
        |FROM graft_star_mr GROUP BY l_returnflag""".stripMargin)
    assert(r1.routed && r1.via == "cuboid", s"got ${r1.via}")
    assert(r1.df.inputFiles.nonEmpty &&
      r1.df.inputFiles.forall(_.contains(narrowRoot)),
      s"expected the narrow realization, got ${r1.df.inputFiles.headOption}")

    // a dim only the wide cube materializes → wide answers
    val r2 = GraftSql.sqlVia(spark, sf,
      """SELECT n_name, sum(disc_price) AS revenue
        |FROM graft_star_mr GROUP BY n_name""".stripMargin)
    assert(r2.routed && r2.df.inputFiles.forall(_.contains(wideRoot)))

    // a measure only the wide cube declares → wide answers
    val r3 = GraftSql.sqlVia(spark, sf,
      """SELECT l_returnflag, count(distinct o_custkey) AS n_cust
        |FROM graft_star_mr GROUP BY l_returnflag""".stripMargin)
    assert(r3.routed && r3.df.inputFiles.forall(_.contains(wideRoot)))

    // narrow answer values equal the wide cube's
    val viaWide = GraftSql.sqlVia(spark, sf,
      """SELECT l_returnflag, sum(disc_price) AS revenue, count(*) AS n
        |FROM graft_star GROUP BY l_returnflag""".stripMargin)
    assert(r1.df.collect().map(x => (x.getString(0), x.getDouble(1),
      x.getLong(2))).toSet ==
      viaWide.df.collect().map(x => (x.getString(0), x.getDouble(1),
        x.getLong(2))).toSet)
  }
}
