package graft

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cube._
import graft.cube.DimRanges.DimRange

/** Dimension-range segment pruning (reference: DimensionRangeInfo.java
  * + common/SegmentPruner.java + TupleFilterNode.java): per-segment
  * min/max on every materialized dim, collected from the base cuboid
  * at build time, persisted in the meta, and consulted by
  * QueryRouter.plan to skip segments a non-time filter cannot match. */
class DimRangeSpec extends AnyFunSuite {
  import TestSpark._

  private def clit(v: Any): Literal = Literal(v)
  private def attr(n: String): Expression = UnresolvedAttribute(n)

  private val intRanges = Map(
    "id" -> DimRange("BIGINT", Some("100"), Some("200")),
    "allnull" -> DimRange("BIGINT", None, None))
  private val strRanges = Map(
    "flag" -> DimRange("STRING", Some("A"), Some("N")))

  // ── canMatch unit semantics (pure metadata, no Spark jobs)

  test("equality prunes outside the range, keeps inside, typed not lexical") {
    assert(!DimRanges.canMatch(intRanges, EqualTo(attr("id"), clit(99L))))
    assert(DimRanges.canMatch(intRanges, EqualTo(attr("id"), clit(100L))))
    assert(DimRanges.canMatch(intRanges, EqualTo(attr("id"), clit(200L))))
    assert(!DimRanges.canMatch(intRanges, EqualTo(attr("id"), clit(201L))))
    // lexically "99" > "200" — a string compare would wrongly keep 99
    // and prune 1000; the typed compare must do neither
    assert(!DimRanges.canMatch(intRanges, EqualTo(attr("id"), clit(1000L))))
    // literal on the LEFT routes the same way
    assert(!DimRanges.canMatch(intRanges, EqualTo(clit(99L), attr("id"))))
  }

  test("range compares respect direction and literal side") {
    // id in [100, 200]
    assert(!DimRanges.canMatch(intRanges, LessThan(attr("id"), clit(100L))))
    assert(DimRanges.canMatch(intRanges, LessThanOrEqual(attr("id"), clit(100L))))
    assert(!DimRanges.canMatch(intRanges, GreaterThan(attr("id"), clit(200L))))
    assert(DimRanges.canMatch(intRanges, GreaterThanOrEqual(attr("id"), clit(200L))))
    // 250 < id ⇔ id > 250 — impossible against max 200
    assert(!DimRanges.canMatch(intRanges, LessThan(clit(250L), attr("id"))))
    // 50 < id — possible
    assert(DimRanges.canMatch(intRanges, LessThan(clit(50L), attr("id"))))
  }

  test("AND prunes when any conjunct is impossible, OR needs every branch impossible") {
    val in = EqualTo(attr("id"), clit(150L))
    val out = EqualTo(attr("id"), clit(500L))
    assert(!DimRanges.canMatch(intRanges, And(in, out)))
    assert(DimRanges.canMatch(intRanges, Or(in, out)))
    assert(!DimRanges.canMatch(intRanges, Or(out, out)))
  }

  test("IN list keeps the segment iff any member is possible") {
    assert(DimRanges.canMatch(intRanges,
      In(attr("id"), Seq(clit(50L), clit(150L)))))
    assert(!DimRanges.canMatch(intRanges,
      In(attr("id"), Seq(clit(50L), clit(500L)))))
    // a NULL in-list member matches no row — it must not rescue
    assert(!DimRanges.canMatch(intRanges,
      In(attr("id"), Seq(clit(50L), Literal(null,
        org.apache.spark.sql.types.LongType)))))
  }

  test("all-null segment prunes compares but never IS NULL") {
    assert(!DimRanges.canMatch(intRanges, EqualTo(attr("allnull"), clit(5L))))
    assert(!DimRanges.canMatch(intRanges, GreaterThan(attr("allnull"), clit(5L))))
    assert(!DimRanges.canMatch(intRanges, IsNotNull(attr("allnull"))))
    assert(DimRanges.canMatch(intRanges, IsNull(attr("allnull"))))
    assert(DimRanges.canMatch(intRanges, IsNotNull(attr("id"))))
  }

  test("unknown dims, opaque shapes, and NOT stay conservative (scan)") {
    assert(DimRanges.canMatch(intRanges, EqualTo(attr("other"), clit(5L))))
    assert(DimRanges.canMatch(intRanges,
      Not(EqualTo(attr("id"), clit(500L)))))
    assert(DimRanges.canMatch(strRanges,
      EqualTo(Upper(attr("flag")), clit("A")))) // function-wrapped dim
    // non-literal right side
    assert(DimRanges.canMatch(intRanges, EqualTo(attr("id"), attr("other"))))
    // a QUALIFIED name never binds to a dim's range (ADVICE r16): it
    // may reference ANOTHER relation that shares the dim's name, and
    // binding it could wrongly prune — out-of-range value answers scan
    assert(DimRanges.canMatch(intRanges,
      EqualTo(UnresolvedAttribute(Seq("other_table", "id")), clit(500L))))
  }

  test("lossy literal casts never prune (the negative-truncation trap)") {
    // range [-10, -10]: `d > -10.5` IS satisfiable (-10 > -10.5), but
    // a truncating cast to -10 would conclude max(-10) > -10 = false
    val neg = Map("d" -> DimRange("BIGINT", Some("-10"), Some("-10")))
    assert(DimRanges.canMatch(neg, GreaterThan(attr("d"), clit(-10.5))))
    // an EXACT double cast still prunes
    assert(!DimRanges.canMatch(neg, GreaterThan(attr("d"), clit(-10.0))))
    // equality against a fractional literal can never match a BIGINT
    // dim — but the inexact cast must answer "scan", not guess
    assert(DimRanges.canMatch(neg, EqualTo(attr("d"), clit(-10.5))))
  }

  test("string dims compare in string order") {
    assert(DimRanges.canMatch(strRanges, EqualTo(attr("flag"), clit("F"))))
    assert(!DimRanges.canMatch(strRanges, EqualTo(attr("flag"), clit("R"))))
    assert(!DimRanges.canMatch(strRanges, GreaterThan(attr("flag"), clit("N"))))
  }

  test("merge unions ranges, defers to the all-null side, drops one-sided dims") {
    val a = Map("id" -> DimRange("BIGINT", Some("100"), Some("200")),
      "empty" -> DimRange("BIGINT", None, None),
      "skew" -> DimRange("BIGINT", Some("9"), Some("9")))
    val b = Map("id" -> DimRange("BIGINT", Some("150"), Some("300")),
      "empty" -> DimRange("BIGINT", Some("1"), Some("2")),
      "skew" -> DimRange("BIGINT", Some("10"), Some("10")),
      "extra" -> DimRange("BIGINT", Some("0"), Some("0")))
    val m = DimRanges.merge(a, b)
    assert(m("id") == DimRange("BIGINT", Some("100"), Some("300")))
    assert(m("empty") == DimRange("BIGINT", Some("1"), Some("2")))
    // typed min: 9 < 10 numerically even though "9" > "10" lexically
    assert(m("skew") == DimRange("BIGINT", Some("9"), Some("10")))
    assert(!m.contains("extra"), "a dim missing from one side stays unknown")
  }

  // ── end to end over the events table: build → collect → persist →
  // load → prune, on the declared four-week cube the oracle key uses

  private lazy val inst: CubeInstance = {
    // own the declared root: a persisted build from an earlier run
    // would LOAD ranges instead of exercising collection — delete and
    // rebuild so this spec always pins the build-time path
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      CubeManager.declaredRoot(sf, "events_ranges"))): Unit
    CubeManager.resetMemos()
    CubeManager.ensureDeclared(
      spark, sf, CubeJson.parse(queries.CubeQueries.declaredRangesDoc))
  }

  test("build collects per-segment ranges and the meta round-trips them") {
    val ranges = inst.dimRanges
    // four segments × two dims (event_type STRING, event_id BIGINT)
    assert(inst.cube.segments.forall(s =>
      ranges.contains((s.name, "event_id")) &&
        ranges.contains((s.name, "event_type"))),
      s"every segment needs collected ranges, got ${ranges.keySet}")
    // event_id is monotone with ts ⇒ weekly id ranges are disjoint
    // and ordered
    val ids = inst.cube.segments.sortBy(_.start).map { s =>
      val r = ranges((s.name, "event_id"))
      (r.min.get.toLong, r.max.get.toLong)
    }
    ids.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"weekly id ranges must be disjoint: $ids")
      case _ =>
    }
    // a cold metadata load reproduces the map byte-for-byte
    val loaded = CubeMeta.load(spark, inst.cube, inst.root)
    assert(loaded.exists(_.inst.dimRanges == ranges),
      "persisted meta must round-trip the collected ranges")
  }

  test("plan prunes segments on a non-time dim filter, answers match source") {
    val ranges = inst.dimRanges
    val (lo, hi) = {
      // aim the window at the INTERIOR of w2's observed id range so
      // the test holds at any sf
      val r = ranges(("w2", "event_id"))
      val (mn, mx) = (r.min.get.toLong, r.max.get.toLong)
      (mn + (mx - mn) / 3, mn + (mx - mn) / 2)
    }
    val q = CubeQuery(Seq("event_type"), Seq("n_events" -> "n"),
      filter = Some(col("event_id") >= lo && col("event_id") <= hi),
      filterDims = Set("event_id"))
    val r = QueryRouter.route(spark, inst, q)(fail("expected routing"))
    assert(!r.fallback)
    assert(r.segments == Seq("w2"),
      s"expected exactly w2 after dim-range pruning, got ${r.segments}")
    val got = r.df.orderBy("event_type").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val want = Tables.tbl(spark, sf, "events")
      .filter(col("event_id").between(lo, hi))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(got.sameElements(want))
  }

  test("a segment without collected ranges is scanned, never pruned") {
    val blind = inst.copy(dimRanges = inst.dimRanges.filterNot {
      case ((s, _), _) => s == "w4" })
    val idMax = inst.dimRanges(("w4", "event_id")).max.get.toLong
    val q = CubeQuery(Seq("event_type"), Seq("n_events" -> "n"),
      filter = Some(col("event_id") === idMax),
      filterDims = Set("event_id"))
    val r = QueryRouter.route(spark, blind, q)(fail("expected routing"))
    assert(r.segments == Seq("w4"),
      s"the range-less segment must survive pruning, got ${r.segments}")
  }

  test("the refresh crash-window meta (stripped entries) scans, never skips") {
    // refreshSegment commits a conservative meta BEFORE the dir swap:
    // the refreshed segment's row counts and dim ranges stripped. A
    // crash between the swap and the final commit leaves exactly that
    // meta — pin that a plan against it SCANS the segment (unknown)
    // instead of skipping it on the stale entries the swap replaced.
    val windowMeta = inst.copy(
      rows = inst.rows.filterNot { case ((s, _), _) => s == "w2" },
      dimRanges = inst.dimRanges.filterNot {
        case ((s, _), _) => s == "w2" })
    // a filter OUTSIDE w2's old id range — stale ranges would prune
    // w2, and a stale rows==0 entry would empty-skip it; the stripped
    // meta must do neither (the corrected data may hold anything)
    val beyond = inst.dimRanges(("w4", "event_id")).max.get.toLong
    val q = CubeQuery(Seq("event_type"), Seq("n_events" -> "n"),
      filter = Some(col("event_id") === beyond),
      filterDims = Set("event_id"))
    val p = QueryRouter.plan(windowMeta, q).getOrElse(fail("plan expected"))
    assert(p.overlapping.map(_.name).contains("w2"),
      s"the stripped segment must scan, got ${p.overlapping.map(_.name)}")
  }

  test("an explicitly empty segment is skipped from metadata alone") {
    val baseId = inst.cube.cuboidId(inst.cube.dims.toSet)
    val emptied = inst.copy(rows = inst.rows + (("w3", baseId) -> 0L))
    val q = CubeQuery(Seq("event_type"), Seq("n_events" -> "n"))
    val p = QueryRouter.plan(emptied, q).getOrElse(fail("plan expected"))
    assert(p.overlapping.map(_.name) == Seq("w1", "w2", "w4"),
      s"rows==0 must skip w3, got ${p.overlapping.map(_.name)}")
  }

  test("the route trace names what each pruning axis dropped") {
    val q = CubeQuery(Seq("event_type"), Seq("n_events" -> "n"),
      filter = Some(col("event_id") <= 10L),
      filterDims = Set("event_id"))
    val (_, trace) = RouteTrace.collect(QueryRouter.plan(inst, q))
    val pruneNotes = trace.filter(_.reason.contains("dim-range"))
    assert(pruneNotes.size == 1 &&
      Seq("w2", "w3", "w4").forall(pruneNotes.head.reason.contains),
      trace.mkString("\n"))
  }

  test("pruning shrinks estRows vs the same plan without range metadata") {
    val q = CubeQuery(Seq("event_type"), Seq("n_events" -> "n"),
      filter = Some(col("event_id") <= 10L),
      filterDims = Set("event_id"))
    val planned = QueryRouter.plan(inst, q).getOrElse(fail("plan expected"))
    assert(planned.overlapping.map(_.name) == Seq("w1"))
    val blind = inst.copy(dimRanges = Map.empty)
    val unpruned = QueryRouter.plan(blind, q).getOrElse(fail("plan expected"))
    assert(unpruned.overlapping.size == 4)
    assert(planned.estRows < unpruned.estRows)
  }
}
