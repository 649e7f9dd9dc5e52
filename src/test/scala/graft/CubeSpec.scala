package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cube._

/** Router edge cases from ADVICE r2: empty time-range overlap,
  * unaligned-range fallback, and residual-filter row parity. */
class CubeSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val inst = CubeManager.ensureBuilt(spark, sf)

  test("time range overlapping no segment returns empty, not an error") {
    val r = QueryRouter.route(spark, inst, CubeQuery(
      Seq("o_orderstatus"), Seq("revenue" -> "revenue"),
      timeRange = Some(("2005-01-01", "2006-01-01"))))(fail("no fallback expected"))
    assert(!r.fallback)
    assert(r.df.count() == 0)
    assert(r.df.columns.toSeq == Seq("o_orderstatus", "revenue"))
  }

  test("non-month-aligned range falls back instead of over-returning") {
    var usedFallback = false
    val r = QueryRouter.route(spark, inst, CubeQuery(
      Seq("o_orderstatus"), Seq("revenue" -> "revenue"),
      timeRange = Some(("1996-03-15", "1997-02-10")))) {
      usedFallback = true
      spark.emptyDataFrame
    }
    assert(r.fallback && usedFallback)
  }

  test("residual month filter matches a source-side row count exactly") {
    val r = QueryRouter.route(spark, inst, CubeQuery(
      Seq("o_orderstatus"), Seq("nrows" -> "n_rows"),
      timeRange = Some(("1996-01-01", "1999-07-01"))))(fail("no fallback expected"))
    assert(r.cuboid.exists(_.contains("o_month")),
      "partial segments must route through a month-bearing cuboid")
    val cubeN = r.df.agg(sum("n_rows")).head().getLong(0)
    val srcN = CubeManager.flatTable(spark, sf)
      .filter("o_orderdate >= '1996-01-01' and o_orderdate < '1999-07-01'")
      .count()
    assert(cubeN == srcN)
  }

  test("shard-by filter prunes partition directories, not just rows") {
    val r = QueryRouter.route(spark, inst, CubeQuery(
      Seq("n_name"), Seq("revenue" -> "revenue"),
      filter = Some(col("r_name") === "ASIA"),
      filterDims = Set("r_name")))(fail("expected cuboid"))
    val plan = r.df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(r_name") &&
      plan.contains("= ASIA)"),
      s"expected partition pruning on r_name, plan:\n${plan.take(2000)}")
  }

  test("the flat table force-broadcasts ONLY the bounded lookups — " +
      "supplier/part scale with SF and must stay size-decided (the " +
      "100x probe's super-linear flat-write finding)") {
    // disable size-based auto-broadcast: whatever still broadcasts is
    // a HINT. nation/region (25/5 rows at any SF) must; supplier/part
    // grow with the fact table — a forced broadcast is a 100 TB OOM
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAqe = scala.util.Try(spark.conf.get(
      "spark.sql.adaptive.autoBroadcastJoinThreshold")).toOption
      .filter(_ != null) // unset optional conf reads back as null
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val plan = CubeManager.flatTable(spark, sf)
        .queryExecution.executedPlan.toString
      val hinted = "BroadcastHashJoin".r.findAllIn(plan).length
      val shuffled = "SortMergeJoin|ShuffledHashJoin".r
        .findAllIn(plan).length
      assert(hinted == 2,
        s"exactly nation+region must be hint-broadcast, got $hinted " +
          s"broadcast joins in:\n${plan.take(2000)}")
      assert(shuffled == 4,
        s"orders/customer/supplier/part must be size-decided (4 " +
          s"shuffle joins with auto-broadcast off), got $shuffled")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      savedAqe match {
        case Some(v) => spark.conf.set(
          "spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset(
          "spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("lookup-table snapshots are written once under the cube root") {
    val root = inst.root
    Seq("customer", "nation", "region", "supplier", "part").foreach { n =>
      assert(new java.io.File(Snapshot.path(root, n)).exists(),
        s"missing snapshot for $n")
    }
  }

  test("incremental segment append equals a full build") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-incr").toString
    val cube = CubeManager.defaultCube
    val flat = {
      val f = CubeManager.flatTable(spark, sf)
      val dict = Dictionary.build(f, "c_name")
      Dictionary.encode(f, dict, "c_name")
    }
    // build the first 3 segments from pre-2001 data, then append the
    // 2001 segment incrementally from the full flat table
    val cube3 = cube.copy(segments = cube.segments.init)
    val inst3 = CubeBuilder.build(spark,
      flat.filter(col("o_orderdate") < cube.segments.last.start), cube3, root)
    val inst4 = CubeBuilder.appendSegment(spark, inst3, flat,
      cube.segments.last)
    assert(inst4.cube.segments.map(_.name) == cube.segments.map(_.name))

    val q = CubeQuery(Seq("l_returnflag"),
      Seq("revenue" -> "revenue", "cust_bitmap" -> "n_cust"))
    val got = QueryRouter.route(spark, inst4, q)(fail("expected cuboid"))
      .df.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val want = QueryRouter.route(spark, CubeManager.ensureBuilt(spark, sf), q)(
      fail("expected cuboid"))
      .df.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("auto-merge compacts the oldest run and answers stay identical") {
    val merged = CubeBuilder.autoMerge(spark, inst, maxSegments = 3)
    val names = merged.cube.segments.map(_.name)
    assert(names.size == 3 && names.head.startsWith("am-"),
      s"expected the two oldest segments compacted, got $names")
    assert(merged.cube.segments.sortBy(_.start) == merged.cube.segments,
      "segments stay time-ordered")
    val q = CubeQuery(Seq("o_orderstatus"),
      Seq("revenue" -> "revenue", "cust_bitmap" -> "n_cust"))
    val got = QueryRouter.route(spark, merged, q)(fail("expected cuboid"))
      .df.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val want = QueryRouter.route(spark, inst, q)(fail("expected cuboid"))
      .df.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == want && want.nonEmpty)
    // below the threshold: a no-op returning the same instance
    assert(CubeBuilder.autoMerge(spark, merged, maxSegments = 3) eq merged)
    // non-contiguous merge requests are rejected
    val Seq(a, _, c) = merged.cube.segments
    intercept[IllegalArgumentException] {
      CubeBuilder.mergeSegments(spark, merged, "bad", Seq(a, c))
    }
  }

  test("a model filterCondition scopes the flat table and blocks " +
      "explicit-join matching") {
    import graft.Tables.{lineitem, orders}
    val m = ModelDef("lineitem",
      Seq(ModelEdge("orders", "lineitem", "o_orderkey", "l_orderkey")),
      filter = Some(col("l_quantity") > 25))
    val tables = Map("lineitem" -> lineitem(spark, sf),
      "orders" -> orders(spark, sf))
    val flat = m.flatten(tables)
    assert(flat.filter(col("l_quantity") <= 25).count() == 0)
    val expect = tables("lineitem").filter(col("l_quantity") > 25)
      .join(tables("orders"), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(flat.count() == expect && expect > 0)
    // a filtered model must NOT match raw-table join SQL — the raw
    // tables contain rows the cube excludes
    GraftSql.registerViews(spark, sf) // raw star tables as temp views
    val plan = spark.sql(
      """SELECT l_returnflag, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag""".stripMargin)
      .queryExecution.analyzed
    val joinTree = plan.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a.child
    }.get
    assert(!ModelMatcher.matches(joinTree, m))
    assert(ModelMatcher.matches(joinTree, m.copy(filter = None)))
  }

  test("derived-dim filter routes via snapshot and matches the source") {
    // DerivedFilterTranslator parity: the predicate names a lookup
    // attribute no cuboid materializes; routing attaches the snapshot
    // on the host and filters there
    val r = QueryRouter.route(spark, inst, CubeQuery(
      Seq("o_orderstatus"), Seq("nrows" -> "n"),
      filter = Some(col("n_nationkey") < 5),
      filterDims = Set("n_nationkey")))(fail("expected cuboid route"))
    assert(!r.fallback)
    assert(r.cuboid.exists(c => c("n_name") && !c("n_nationkey")),
      s"cuboid must cover the HOST dim, got ${r.cuboid}")
    val got = r.df.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val want = CubeManager.flatTable(spark, sf)
      .join(graft.Tables.nation(spark, sf).select("n_name", "n_nationkey"),
        Seq("n_name"))
      .filter(col("n_nationkey") < 5)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(got == want && want.nonEmpty)
    // unknown filter names still fall back cleanly
    var fell = false
    QueryRouter.route(spark, inst, CubeQuery(
      Seq("o_orderstatus"), Seq("nrows" -> "n"),
      filter = Some(col("o_orderstatus") === "F"),
      filterDims = Set("not_a_dim"))) { fell = true; spark.emptyDataFrame }
    assert(fell)
  }

  test("agg-group expansion matches the hand-computed pruned lattice") {
    // reference AggregationGroup.java:47-75 semantics: mandatory in
    // every cuboid, hierarchy prefixes only, joints all-or-none
    val g = AggGroup(
      includes = Seq("r_name", "n_name", "o_orderstatus", "l_returnflag"),
      mandatory = Set("o_orderstatus"),
      hierarchies = Seq(Seq("r_name", "n_name")))
    val want = Set(
      Set("o_orderstatus"),
      Set("o_orderstatus", "l_returnflag"),
      Set("o_orderstatus", "r_name"),
      Set("o_orderstatus", "r_name", "l_returnflag"),
      Set("o_orderstatus", "r_name", "n_name"),
      Set("o_orderstatus", "r_name", "n_name", "l_returnflag"))
    assert(g.expand.toSet == want)
    // the hierarchy-violating cuboid (nation without region) is pruned
    assert(!g.expand.exists(c => c("n_name") && !c("r_name")))
    // joints are all-or-none
    val gj = AggGroup(Seq("a", "b", "c"), joints = Seq(Set("a", "b")))
    assert(gj.expand.toSet == Set(Set.empty[String], Set("c"),
      Set("a", "b"), Set("a", "b", "c")))
    // a dim can't be governed by two rules
    intercept[IllegalArgumentException] {
      AggGroup(Seq("a", "b"), hierarchies = Seq(Seq("a", "b")),
        joints = Seq(Set("b")))
    }
  }

  test("a cube built on an agg-group lattice routes pruned shapes by re-agg") {
    val root = java.nio.file.Files.createTempDirectory("graft-agggroup").toString
    val dims = Seq("r_name", "n_name", "o_orderstatus", "l_returnflag")
    val groups = Seq(AggGroup(dims,
      mandatory = Set("o_orderstatus"),
      hierarchies = Seq(Seq("r_name", "n_name"))))
    val cube0 = CubeManager.defaultCube
    val cube = cube0.copy(name = "agggroup", dims = dims,
      cuboids = AggGroup.cuboids(dims, groups),
      measures = cube0.measures.filter(m => Set("revenue", "nrows")(m.name)),
      shardBy = None, derived = Nil, extended = Nil)
    val built = CubeBuilder.build(spark,
      CubeManager.flatTable(spark, sf), cube, root)
    // n_name alone was PRUNED (hierarchy): the query routes through the
    // (o_orderstatus, r_name, n_name) prefix cuboid and re-aggregates
    val r = QueryRouter.route(spark, built, CubeQuery(
      Seq("n_name"), Seq("nrows" -> "n")))(fail("expected cuboid route"))
    assert(!r.fallback)
    assert(r.cuboid.exists(c => c("r_name") && c("n_name") && c != dims.toSet),
      s"expected the hierarchy prefix cuboid, got ${r.cuboid}")
    val got = r.df.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val want = CubeManager.flatTable(spark, sf)
      .groupBy("n_name").agg(count(lit(1)).as("n"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(got == want && want.nonEmpty)
  }

  test("bitmap count-distinct stays exact across two re-aggregation layers") {
    // route the coarsest o_month query (served by the o_month cuboid,
    // itself built from a parent) and compare with the source
    val got = QueryRouter.route(spark, inst, CubeQuery(
      Seq("o_month"), Seq("cust_bitmap" -> "n_cust")))(fail("expected cuboid"))
      .df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = CubeManager.flatTable(spark, sf)
      .groupBy("o_month").agg(countDistinct("o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && want.nonEmpty)
  }
}
