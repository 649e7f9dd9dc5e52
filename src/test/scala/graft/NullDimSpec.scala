package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cube._
import graft.functions.Measures

/** NULL dimension values through the whole cube engine (VERDICT r9
  * item 3; reference: core-dictionary encodes NULL explicitly and the
  * rowkey machinery round-trips it): the testdata has no NULL dims, so
  * this fixture forces NULLs into a cuboid dim, a lookup attribute, a
  * derived-dim host key, the dict-encoded bitmap column, and every
  * sketch input — and pins build → route → re-agg parity against the
  * raw-scan answer. SQL aggregate semantics (count distinct /
  * percentile skip NULL; NULL is a group key) must survive the
  * layered build's state re-aggregation.
  */
class NullDimSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val fixture: (CubeInstance, org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) = {
    val root = java.nio.file.Files.createTempDirectory("graft-null").toString
    val raw = spark.range(1200).selectExpr(
      "timestampadd(DAY, cast(id % 28 as int), timestamp'2024-01-01') as ts",
      // dim with NULLs (every 7th row)
      "CASE WHEN id % 7 = 0 THEN NULL ELSE concat('c', id % 3) END as cat",
      // derived-dim host key with NULLs (every 11th row)
      "CASE WHEN id % 11 = 0 THEN NULL ELSE cast(id % 5 as bigint) END as k",
      // dict-encoded bitmap input with NULLs (every 5th row)
      "CASE WHEN id % 5 = 0 THEN NULL ELSE concat('n', id % 37) END as name",
      // sketch inputs with NULLs; v is never 0 so a phantom 0.0 from a
      // mis-handled NULL is detectable at the low quantile
      "CASE WHEN id % 13 = 0 THEN NULL ELSE cast(1 + id % 97 as double) END as v",
      "cast(id % 251 as bigint) as uid")
    // lookup with NULL attribute values for odd keys
    val lkp = spark.range(5).selectExpr("cast(id as bigint) as k",
      "CASE WHEN id % 2 = 1 THEN NULL ELSE concat('A', id) END as attr")
    Snapshot.ensure(spark, lkp, root, "lkp")
    val dict = Dictionary.buildOrAppend(spark, raw, "name", root)
    val flat = Dictionary.encode(raw, dict, "name")
    val cube = CubeDef("nulls", Seq("cat", "k"),
      Seq(
        Measure("nrows", count(lit(1)), s => sum(col(s))),
        Measure("v_sum", sum(col("v")), s => sum(col(s))),
        Measure("name_bm", Measures.bitmapAgg(Dictionary.idCol("name")),
          s => Measures.bitmapUnion(col(s)),
          present = Measures.bitmapCount(_)),
        Measure("uid_hll", Measures.hllAgg(col("uid")),
          s => Measures.hllUnion(col(s)),
          present = Measures.hllEstimate(_)),
        Measure("v_kll_lo", Measures.kllAgg(col("v")),
          s => Measures.kllUnion(col(s)),
          present = Measures.kllQuantile(_, lit(0.001)))),
      "ts",
      Seq(Segment("m1", "2024-01-01", "2024-02-01")),
      // (cat) is built FROM (cat, k) — the layered build itself
      // re-aggregates states across NULL dim groups
      Seq(Set("cat", "k"), Set("cat")),
      derived = Seq(DerivedDim("attr", "k", "lkp")))
    (CubeBuilder.build(spark, flat, cube, root), raw, lkp)
  }
  private def inst = fixture._1
  private def raw = fixture._2
  private def lkp = fixture._3

  private def keyOf(r: Row, i: Int): Option[Any] =
    if (r.isNullAt(i)) None else Some(r.get(i))

  test("NULL dim groups route and re-aggregate exactly (incl. sketches)") {
    val r = QueryRouter.route(spark, inst, CubeQuery(Seq("cat"), Seq(
      "nrows" -> "n", "v_sum" -> "vs", "name_bm" -> "nd",
      "uid_hll" -> "uh", "v_kll_lo" -> "klo")))(fail("no fallback expected"))
    assert(!r.fallback && r.cuboid.contains(Set("cat")))
    val got = r.df.collect().map(x => keyOf(x, 0) -> x).toMap
    val want = raw.groupBy("cat").agg(
      count(lit(1)).as("n"), sum(col("v")).as("vs"),
      countDistinct(col("name")).as("nd"),
      countDistinct(col("uid")).as("ue"),
      min(col("v")).as("vmin"))
      .collect().map(x => keyOf(x, 0) -> x).toMap
    assert(got.keySet == want.keySet && got.contains(None),
      "the NULL dim value must form its own group")
    want.foreach { case (key, w) =>
      val g = got(key)
      assert(g.getLong(1) == w.getLong(1), s"$key nrows")
      assert(math.abs(g.getDouble(2) - w.getDouble(2)) < 1e-9, s"$key v_sum")
      // dict bitmap: exact distinct, NULL names excluded like SQL
      assert(g.getLong(3) == w.getLong(3), s"$key name distinct")
      // hll: near-exact at this cardinality; a phantom NULL id would
      // show as a +1 drift on every group
      assert(math.abs(g.getLong(4) - w.getLong(4)) <= w.getLong(4) / 20 + 1,
        s"$key hll ${g.getLong(4)} vs ${w.getLong(4)}")
      // kll at rank ~0: equals the group's non-null minimum (>= 1.0);
      // a NULL coerced to 0.0 would surface here
      assert(g.getDouble(5) == w.getDouble(5),
        s"$key kll low ${g.getDouble(5)} vs min ${w.getDouble(5)}")
    }
  }

  test("query-time re-agg across a NULL dim matches the raw scan") {
    // no (k) cuboid: routes (cat, k) and re-aggregates across cat,
    // merging the NULL-cat cells into every k group
    val r = QueryRouter.route(spark, inst, CubeQuery(Seq("k"), Seq(
      "nrows" -> "n", "name_bm" -> "nd")))(fail("no fallback expected"))
    assert(!r.fallback && r.cuboid.contains(Set("cat", "k")))
    val got = r.df.collect().map(x => keyOf(x, 0) -> x).toMap
    val want = raw.groupBy("k").agg(count(lit(1)).as("n"),
      countDistinct(col("name")).as("nd"))
      .collect().map(x => keyOf(x, 0) -> x).toMap
    assert(got.keySet == want.keySet && got.contains(None),
      "NULL host keys must survive as their own group")
    want.foreach { case (key, w) =>
      assert(got(key).getLong(1) == w.getLong(1), s"$key nrows")
      assert(got(key).getLong(2) == w.getLong(2), s"$key name distinct")
    }
  }

  test("exact-match path presents NULL dim cells directly") {
    val r = QueryRouter.route(spark, inst, CubeQuery(Seq("cat", "k"),
      Seq("nrows" -> "n")))(fail("no fallback expected"))
    assert(!r.fallback)
    val got = r.df.collect()
      .map(x => (keyOf(x, 0), keyOf(x, 1)) -> x.getLong(2)).toMap
    val want = raw.groupBy("cat", "k").agg(count(lit(1)).as("n"))
      .collect().map(x => (keyOf(x, 0), keyOf(x, 1)) -> x.getLong(2)).toMap
    assert(got == want)
    assert(got.keys.exists(_._1.isEmpty) && got.keys.exists(_._2.isEmpty))
  }

  test("derived dim with NULL hosts and NULL lookup attrs matches raw join") {
    val r = QueryRouter.route(spark, inst, CubeQuery(Seq("attr"),
      Seq("nrows" -> "n", "v_sum" -> "vs")))(fail("no fallback expected"))
    assert(!r.fallback)
    val got = r.df.collect().map(x => keyOf(x, 0) -> x).toMap
    // raw-scan truth: left join, so NULL host keys AND NULL attr values
    // both land in the NULL attr group
    val want = raw.join(lkp, Seq("k"), "left").groupBy("attr")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("vs"))
      .collect().map(x => keyOf(x, 0) -> x).toMap
    assert(got.keySet == want.keySet && got.contains(None))
    want.foreach { case (key, w) =>
      assert(got(key).getLong(1) == w.getLong(1), s"$key nrows")
      assert(math.abs(got(key).getDouble(2) - w.getDouble(2)) < 1e-9,
        s"$key v_sum")
    }
  }
}
