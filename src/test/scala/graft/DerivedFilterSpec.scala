package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cube._

/** Derived-filter → host-dim translation (reference: core-cube/.../
  * model/DerivedFilterTranslator.java feeding common/SegmentPruner
  * .java): lookup-attribute predicates evaluate once against the
  * frozen snapshot, the matching host keys become an IN-set, and the
  * per-segment host ranges prune from metadata alone. Uses the
  * `orders_dprune` declared cube (the `cube_derived_prune` oracle
  * key's): segments k1/k2/k3 slice the customer-key space [0,15),
  * [15,115), [115,…), and c_name is derived on host c_custkey. */
class DerivedFilterSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val inst: CubeInstance = {
    // own the declared root (order-dependent suites share it)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      CubeManager.declaredRoot(sf, "orders_dprune"))): Unit
    CubeManager.resetMemos()
    DerivedFilterTranslator.clearMemo()
    CubeManager.ensureDeclared(
      spark, sf, CubeJson.parse(
        queries.CubeQueries.declaredDerivedPruneDoc))
  }

  private def q(filter: org.apache.spark.sql.Column) =
    CubeQuery(Seq("o_orderstatus"), Seq("n_orders" -> "n"),
      filter = Some(filter), filterDims = Set("c_name"))

  private def sourceCounts(pred: org.apache.spark.sql.Column)
      : Array[(String, Long)] =
    Tables.tbl(spark, sf, "orders")
      .join(Tables.tbl(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .filter(pred)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus").collect()
      .map(r => (r.getString(0), r.getLong(1)))

  private def routedCounts(r: Routed): Array[(String, Long)] =
    r.df.orderBy("o_orderstatus").collect()
      .map(r => (r.getString(0), r.getLong(1)))

  test("a derived equality filter prunes to the host's segment") {
    val r = QueryRouter.route(spark, inst,
      q(col("c_name") === "Customer#000000003"))(fail("must route"))
    assert(!r.fallback)
    assert(r.segments == Seq("k1"),
      s"host key 3 lives in k1 alone, got ${r.segments}")
    assert(routedCounts(r).sameElements(
      sourceCounts(col("c_name") === "Customer#000000003")))
  }

  test("a derived range compare prunes to the tail segment") {
    // zero-padded names order like keys: >= #145 ⇒ hosts 145…, all k3
    val r = QueryRouter.route(spark, inst,
      q(col("c_name") >= "Customer#000000145"))(fail("must route"))
    assert(!r.fallback)
    assert(r.segments == Seq("k3"),
      s"hosts 145+ live in k3 alone, got ${r.segments}")
    assert(routedCounts(r).sameElements(
      sourceCounts(col("c_name") >= "Customer#000000145")))
  }

  test("an empty host set short-circuits to an empty routed result") {
    val r = QueryRouter.route(spark, inst,
      q(col("c_name") === "Customer#nobody"))(fail("must route"))
    assert(!r.fallback)
    assert(r.segments.isEmpty,
      s"no snapshot row matches ⇒ every segment pruned, got ${r.segments}")
    assert(r.df.count() == 0)
  }

  test("host-set overflow keeps the leaf — conservative scan, same answer") {
    val pred = col("c_name") < "Customer#000000115" // 115 hosts
    val translated = QueryRouter.route(spark, inst, q(pred))(
      fail("must route"))
    assert(translated.segments == Seq("k1", "k2"),
      s"hosts 0-114 span k1+k2, got ${translated.segments}")
    spark.conf.set("graft.derivedFilter.maxHostIn", "3")
    try {
      val r = QueryRouter.route(spark, inst, q(pred))(fail("must route"))
      assert(!r.fallback)
      assert(r.segments == Seq("k1", "k2", "k3"),
        s"past the bound nothing translates and nothing prunes, " +
          s"got ${r.segments}")
      assert(QueryRouter.plan(inst, q(pred)).get.hostPrune.isEmpty,
        "no scan-side predicate survives an overflow either")
      assert(routedCounts(r).sameElements(sourceCounts(pred)),
        "the conservative path must not change the answer")
    } finally spark.conf.unset("graft.derivedFilter.maxHostIn")
  }

  test("IS NULL on the derived attr never translates (absent hosts)") {
    // a host absent from the snapshot would satisfy IS NULL after the
    // left join while no snapshot row does — the whitelist must skip
    // it: all three segments scanned, zero rows (every key is named)
    val r = QueryRouter.route(spark, inst,
      CubeQuery(Seq("o_orderstatus"), Seq("n_orders" -> "n"),
        filter = Some(col("c_name").isNull),
        filterDims = Set("c_name")))(fail("must route"))
    assert(!r.fallback)
    assert(r.segments == Seq("k1", "k2", "k3"),
      s"an untranslatable leaf must scan everything, got ${r.segments}")
    assert(r.df.count() == 0)
  }

  test("OR of derived leaves prunes per branch; no scan-side conjunct") {
    val pred = (col("c_name") === "Customer#000000003") ||
      (col("c_name") === "Customer#000000145")
    val p = QueryRouter.plan(inst, q(pred)).get
    assert(p.overlapping.map(_.name) == Seq("k1", "k3"),
      s"the two branches land in k1 and k3; k2 prunes — got " +
        s"${p.overlapping.map(_.name)}")
    assert(p.hostPrune.isEmpty,
      "a disjunct is not a standalone scan-side conjunct")
    val r = QueryRouter.route(spark, inst, q(pred))(fail("must route"))
    assert(routedCounts(r).sameElements(sourceCounts(pred)))
  }

  test("a translated conjunct becomes a scan-side host predicate") {
    val p = QueryRouter.plan(inst,
      q(col("c_name") === "Customer#000000003")).get
    assert(p.hostPrune.nonEmpty,
      "the host IN-set must reach the cuboid scan (shard dirs / " +
        "row-group skipping)")
  }

  test("canMatch on a boolean literal: FALSE prunes, TRUE scans") {
    assert(!DimRanges.canMatch(Map.empty, Literal.FalseLiteral))
    assert(DimRanges.canMatch(Map.empty, Literal.TrueLiteral))
  }
}
