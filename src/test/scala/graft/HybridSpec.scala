package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cube._

/** HybridRouter coverage guard (VERDICT r9 "what's wrong" item 1):
  * `HybridInstance` admits gapped slices (disjoint + ordered is all the
  * constructor checks, matching HybridInstance.java which sorts members
  * by dateRangeStart without demanding contiguity), so the ROUTER must
  * refuse to answer a query range spanning an uncovered gap — unioning
  * the touched slices would silently drop the gap's rows. */
class HybridSpec extends AnyFunSuite {
  import TestSpark._

  /** one-month cube: 2 rows per day, dims (d_day), count measure */
  private def monthCube(name: String, start: String, end: String): CubeInstance = {
    val root = java.nio.file.Files.createTempDirectory(s"graft-hyb-$name").toString
    val days = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(start), java.time.LocalDate.parse(end)).toInt
    val df = spark.range(days * 2L).selectExpr(
        s"timestampadd(DAY, cast(id / 2 as int), timestamp'$start') as ts")
      .withColumn("d_day", date_format(col("ts"), "yyyy-MM-dd"))
    val cube = CubeDef(name, Seq("d_day"),
      Seq(Measure("n", fromRaw = count(lit(1)), fromState = s => sum(col(s)))),
      "ts", Seq(Segment("m", start, end)), Seq(Set("d_day")),
      timeDim = Some(TimeDim("d_day", d => Some(d.substring(0, 10)))))
    CubeBuilder.build(spark, df, cube, root)
  }

  private lazy val jan = monthCube("hja", "2024-01-01", "2024-02-01")
  private lazy val mar = monthCube("hmr", "2024-03-01", "2024-04-01")
  private lazy val feb = monthCube("hfb", "2024-02-01", "2024-03-01")

  private def q(lo: String, hi: String) = CubeQuery(
    Seq("d_day"), Seq("n" -> "n"), timeRange = Some((lo, hi)))

  test("a range spanning an uncovered gap falls back instead of losing rows") {
    // gap: [2024-02-01, 2024-03-01) belongs to no slice
    val h = HybridInstance("gapped", Seq(
      HybridSlice(jan, QueryRouter.MinDay, "2024-02-01"),
      HybridSlice(mar, "2024-03-01", QueryRouter.MaxDay)))
    var fell = false
    val r = HybridRouter.routeStates(spark, h, q("2024-01-15", "2024-03-15")) {
      fell = true; spark.emptyDataFrame
    }
    assert(r.fallback && fell,
      "gap-spanning range must fall back - a spliced answer drops February")
    // an open range (no time filter) spans the gap too
    val r2 = HybridRouter.routeStates(spark, h,
      CubeQuery(Seq("d_day"), Seq("n" -> "n")))(spark.emptyDataFrame)
    assert(r2.fallback)
  }

  test("in-slice and gap-avoiding ranges still route on a gapped hybrid") {
    val h = HybridInstance("gapped2", Seq(
      HybridSlice(jan, QueryRouter.MinDay, "2024-02-01"),
      HybridSlice(mar, "2024-03-01", QueryRouter.MaxDay)))
    val r = HybridRouter.routeStates(spark, h, q("2024-01-05", "2024-01-10"))(
      fail("in-slice range must not fall back"))
    assert(!r.fallback)
    assert(r.df.agg(sum("n")).head().getLong(0) == 10) // 5 days x 2 rows
  }

  /** like [[monthCube]] but with a dict-encoded bitmap measure: the
    * flat table carries `d_day_id` ids assigned in THIS cube's own
    * order (offset distinguishes the two roots' id spaces, exactly the
    * state two independently-built members are in) */
  private def dictCube(name: String, start: String, end: String,
                       idOffset: Long,
                       root: Option[String] = None,
                       sharedDict: Boolean = false): CubeInstance = {
    val rootDir = root.getOrElse(java.nio.file.Files
      .createTempDirectory(s"graft-hyd-$name").toString)
    val days = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(start), java.time.LocalDate.parse(end)).toInt
    val df = spark.range(days * 2L).selectExpr(
        s"timestampadd(DAY, cast(id / 2 as int), timestamp'$start') as ts")
      .withColumn("d_day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("d_day_id",
        expr(s"cast(datediff(ts, timestamp'$start') as bigint) + $idOffset"))
    val cube = CubeDef(name, Seq("d_day"),
      Seq(
        Measure("n", fromRaw = count(lit(1)), fromState = s => sum(col(s))),
        Measure("day_bitmap",
          fromRaw = graft.functions.Measures.bitmapAgg(col("d_day_id")),
          fromState = s => graft.functions.Measures.bitmapUnion(col(s)),
          present = graft.functions.Measures.bitmapCount(_))),
      "ts", Seq(Segment("m", start, end)), Seq(Set("d_day")),
      timeDim = Some(TimeDim("d_day", d => Some(d.substring(0, 10)))),
      dictColumns = Set("d_day"), sharedDictRoot = sharedDict)
    CubeBuilder.build(spark, df, cube, rootDir)
  }

  test("a splice touching two members refuses dict-encoded bitmap " +
      "states (root-local id spaces) and falls back") {
    // both members assign d_day_id in their OWN append order — the
    // id spaces overlap numerically but mean different values, so a
    // bitmap_union across the cutover would undercount: jan's ids are
    // 1.. and feb's are 1.. too (idOffset 1 on both = the collision)
    val h = HybridInstance("dicth", Seq(
      HybridSlice(dictCube("hdja", "2024-01-01", "2024-02-01", 1L),
        QueryRouter.MinDay, "2024-02-01"),
      HybridSlice(dictCube("hdfb", "2024-02-01", "2024-03-01", 1L),
        "2024-02-01", QueryRouter.MaxDay)))
    var fell = false
    val (r, trace) = RouteTrace.collect {
      HybridRouter.routeStates(spark, h,
        CubeQuery(Seq.empty, Seq("day_bitmap" -> "days"),
          timeRange = Some(("2024-01-25", "2024-02-05")))) {
        fell = true; spark.emptyDataFrame
      }
    }
    assert(r.fallback && fell,
      "a cross-member splice of dict-encoded bitmaps must fall back " +
        "- unioning per-root id spaces silently undercounts")
    assert(trace.exists(e => e.stage == "router" &&
      e.reason.contains("dictionary-encoded")),
      s"route trace must name the refusal class, got $trace")
    // single-member ranges still serve the bitmap: one root's ids are
    // coherent (7 distinct January days)
    val one = HybridRouter.routeStates(spark, h,
      CubeQuery(Seq.empty, Seq("day_bitmap" -> "days"),
        timeRange = Some(("2024-01-25", "2024-02-01"))))(
      fail("an in-slice range must not fall back"))
    assert(!one.fallback)
    // states mode: union the routed bitmap states, then count
    val mm = graft.functions.Measures
    assert(one.df.agg(mm.bitmapUnion(col("days")).as("bm"))
      .select(mm.bitmapCount(col("bm"))).head().getLong(0) == 7)
    // and the splice still serves measures that DO merge across roots
    val n = HybridRouter.routeStates(spark, h,
      CubeQuery(Seq.empty, Seq("n" -> "n"),
        timeRange = Some(("2024-01-25", "2024-02-05"))))(
      fail("a covered range over mergeable states must not fall back"))
    assert(!n.fallback)
    assert(n.df.agg(sum("n")).head().getLong(0) == 22) // 7+4 days, 2 rows each
    // the SHARED-ID-SPACE escape: members in ONE root whose defs
    // GUARANTEE shared-tree encoding (sharedDictRoot — the rootScope
    // build) splice soundly and must NOT fall back
    val shared = java.nio.file.Files
      .createTempDirectory("graft-hyd-shared").toString
    val h2 = HybridInstance("dicth2", Seq(
      HybridSlice(dictCube("hdja2", "2024-01-01", "2024-02-01", 1L,
        root = Some(shared), sharedDict = true),
        QueryRouter.MinDay, "2024-02-01"),
      HybridSlice(dictCube("hdfb2", "2024-02-01", "2024-03-01", 32L,
        root = Some(shared), sharedDict = true),
        "2024-02-01", QueryRouter.MaxDay)))
    val ok = HybridRouter.routeStates(spark, h2,
      CubeQuery(Seq.empty, Seq("day_bitmap" -> "days"),
        timeRange = Some(("2024-01-25", "2024-02-05"))))(
      fail("a shared-root dict splice must route"))
    assert(!ok.fallback)
    // ids were laid out disjointly (as one shared dictionary would):
    // 7 January days + 4 February days = 11 distinct
    assert(ok.df.agg(mm.bitmapUnion(col("days")).as("bm"))
      .select(mm.bitmapCount(col("bm"))).head().getLong(0) == 11)
    // a bare same-DIRECTORY coincidence without the guarantee still
    // falls back: sharing a root proves nothing about id provenance
    val h3 = HybridInstance("dicth3", Seq(
      HybridSlice(dictCube("hdja3", "2024-01-01", "2024-02-01", 1L,
        root = Some(shared)), QueryRouter.MinDay, "2024-02-01"),
      HybridSlice(dictCube("hdfb3", "2024-02-01", "2024-03-01", 1L,
        root = Some(shared)), "2024-02-01", QueryRouter.MaxDay)))
    val refused = HybridRouter.routeStates(spark, h3,
      CubeQuery(Seq.empty, Seq("day_bitmap" -> "days"),
        timeRange = Some(("2024-01-25", "2024-02-05"))))(
      spark.emptyDataFrame)
    assert(refused.fallback,
      "same directory without the shared-tree guarantee must refuse")
  }

  test("contiguous slices splice across the cutover with no row loss") {
    val h = HybridInstance("contig", Seq(
      HybridSlice(jan, QueryRouter.MinDay, "2024-02-01"),
      HybridSlice(feb, "2024-02-01", QueryRouter.MaxDay)))
    val r = HybridRouter.routeStates(spark, h, q("2024-01-25", "2024-02-05"))(
      fail("covered range must not fall back"))
    assert(!r.fallback)
    // 7 Jan days + 4 Feb days, 2 rows each
    assert(r.df.agg(sum("n")).head().getLong(0) == 22)
  }
}
