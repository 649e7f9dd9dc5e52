package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cube._
import graft.functions.Measures

/** The append-stable dictionary contract (VERDICT r4 item 1, reference
  * AppendTrieDictionary.java:66): existing values keep their ids across
  * rebuilds, new values get ids strictly above max(existing), and
  * bitmap states built against DIFFERENT dictionary versions merge to
  * exact counts. */
class DictionarySpec extends AnyFunSuite {
  import TestSpark._

  test("append keeps existing ids; new values get ids above the old max") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-dict").toString
    val d1 = Dictionary.buildOrAppend(spark,
      Seq("b", "a", "c", "a").toDF("v"), "v", root)
    val m1 = d1.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m1.keySet == Set("a", "b", "c"))
    assert(m1.values.toSeq.sorted == Seq(1L, 2L, 3L), "dense from 1")

    val d2 = Dictionary.buildOrAppend(spark,
      Seq("c", "e", "b", "d").toDF("v"), "v", root)
    val m2 = d2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m2.keySet == Set("a", "b", "c", "d", "e"))
    m1.foreach { case (v, id) =>
      assert(m2(v) == id, s"existing id for $v must not change")
    }
    assert(Seq("d", "e").forall(v => m2(v) > 3L), "new ids above old max")
    assert(m2.values.toSet.size == 5, "injective")

    // no new values ⇒ no new version, same mapping
    val d3 = Dictionary.buildOrAppend(spark, Seq("a", "e").toDF("v"), "v", root)
    val m3 = d3.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m3 == m2)
  }

  test("scheme-qualified cube root: version listing goes through Hadoop FS") {
    // Deployment shape: on hdfs:// or s3a:// roots a java.io.File listing
    // silently returns version 0, so buildOrAppend would overwrite v1 and
    // reassign every id. Pin that the listing resolves through the Hadoop
    // FileSystem of the root's own scheme by running the whole
    // build→append cycle against an explicit file:/// URI root.
    import spark.implicits._
    val root = "file://" + Files.createTempDirectory("graft-dict-fs").toString
    assert(Dictionary.latestVersion(spark, root, "v") == 0)
    val d1 = Dictionary.buildOrAppend(spark,
      Seq("b", "a").toDF("v"), "v", root)
    assert(Dictionary.latestVersion(spark, root, "v") == 1)
    val m1 = d1.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val d2 = Dictionary.buildOrAppend(spark,
      Seq("c", "a").toDF("v"), "v", root)
    assert(Dictionary.latestVersion(spark, root, "v") == 2,
      "append must create v2, not overwrite v1")
    val m2 = d2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    m1.foreach { case (v, id) => assert(m2(v) == id) }
    assert(m2("c") > m1.values.max)

    // snapshots resolve through the same FS machinery
    val snap = Snapshot.ensure(spark, Seq((1, "x")).toDF("k", "s"), root, "t")
    assert(snap.count() == 1)
    assert(Snapshot.ensure(spark, Seq((2, "y")).toDF("k", "s"), root, "t")
      .collect().map(_.getInt(0)).toSeq == Seq(1), "snapshot is write-once")
  }

  test("bitmap states built against successive dict versions merge exactly") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-dict-bm").toString
    val seg1 = Seq(("g1", "alice"), ("g1", "bob"), ("g2", "alice"))
      .toDF("g", "name")
    val seg2 = Seq(("g1", "carol"), ("g2", "bob"), ("g2", "dave"),
      ("g2", "alice")).toDF("g", "name")

    // seg1 encoded with dict v1; seg2 with the appended v2 — the old
    // states must still be valid under v2 (ids never reassigned)
    val dict1 = Dictionary.buildOrAppend(spark, seg1, "name", root)
    val st1 = Dictionary.encode(seg1, dict1, "name")
      .groupBy("g").agg(Measures.bitmapAgg(col("name_id")).as("st"))
    val dict2 = Dictionary.buildOrAppend(spark, seg2, "name", root)
    val st2 = Dictionary.encode(seg2, dict2, "name")
      .groupBy("g").agg(Measures.bitmapAgg(col("name_id")).as("st"))

    val got = st1.unionByName(st2)
      .groupBy("g").agg(Measures.bitmapUnion(col("st")).as("st"))
      .select(col("g"), Measures.bitmapCount(col("st")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = seg1.unionByName(seg2)
      .groupBy("g").agg(countDistinct("name").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && want.nonEmpty)
  }

  test("cube append with NEW c_name values keeps the dict bitmap exact") {
    // End-to-end: build segment 1 with a dictionary from ONLY its data,
    // then append segment 2 — which introduces c_name values unseen in
    // segment 1 — with the APPENDED dictionary. The routed bitmap count
    // over both segments must equal the source exactly. (Under the old
    // rank-based dictionary the rebuild reassigned ids and this query
    // silently miscounted.)
    val root = Files.createTempDirectory("graft-dict-cube").toString
    val cube = CubeManager.defaultCube
    val Seq(seg1, seg2) = cube.segments.take(2)
    val rawFlat = CubeManager.flatTable(spark, sf)
      .filter(col("o_orderdate") < seg2.end)

    val flat1 = rawFlat.filter(col("o_orderdate") < seg1.end)
    val dict1 = Dictionary.buildOrAppend(spark, flat1, "c_name", root)
    val inst1 = CubeBuilder.build(spark,
      Dictionary.encode(flat1, dict1, "c_name"),
      cube.copy(segments = Seq(seg1)), root)

    val flat2 = rawFlat.filter(col("o_orderdate") >= seg2.start)
    val newNames = flat2.select("c_name").distinct()
      .join(dict1, Seq("c_name"), "left_anti").count()
    assert(newNames > 0,
      "appended segment must introduce new c_name values (else vacuous)")

    val dict2 = Dictionary.buildOrAppend(spark, flat2, "c_name", root)
    val inst2 = CubeBuilder.appendSegment(spark, inst1,
      Dictionary.encode(flat2, dict2, "c_name"), seg2)

    val got = QueryRouter.route(spark, inst2, CubeQuery(
      Seq("r_name"), Seq("cname_bitmap" -> "n_names")))(fail("expected route"))
      .df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = rawFlat.groupBy("r_name")
      .agg(countDistinct("c_name").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && want.nonEmpty)
  }

  test("id space stays collision-free and bitmaps exact past 2^31") {
    // Headroom contract (reference AppendTrieDictionary.java:66 caps at
    // Integer.MAX_VALUE; graft ids are Longs end to end): seed a
    // persisted dictionary version whose ids already STRADDLE 2^31 —
    // written directly as the versioned parquet the append path reads,
    // so no 2-billion-row build is needed — then append through the
    // real buildOrAppend and prove (a) existing ids survive unchanged,
    // (b) new ids land strictly above the >2^31 max with no collision
    // (no Int truncation anywhere in base+rank+offset arithmetic), and
    // (c) Roaring64-backed bitmap states over >2^31 ids count exactly.
    import spark.implicits._
    val root = Files.createTempDirectory("graft-dict-2g").toString
    val boundary = Int.MaxValue.toLong + 1 // 2^31

    // v1: 100 values with ids 2^31-50 .. 2^31+49 (persisted exactly as
    // Dictionary.persist lays them out; Spark's _SUCCESS commits it)
    val seeded = (0 until 100)
      .map(i => (f"v$i%04d", boundary - 50 + i)).toDF("v", "dict_id")
    seeded.write.parquet(s"$root/dict/v/v1")
    assert(Dictionary.latestVersion(spark, root, "v") == 1)

    // append: 100 existing + 100 new values through the public path
    val incoming = (0 until 200).map(i => f"v$i%04d").toDF("v")
    val d2 = Dictionary.buildOrAppend(spark, incoming, "v", root)
    val m2 = d2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m2.size == 200 && m2.values.toSet.size == 200, "injective")
    (0 until 100).foreach { i =>
      assert(m2(f"v$i%04d") == boundary - 50 + i,
        "existing ids across the 2^31 boundary must not change")
    }
    val newIds = (100 until 200).map(i => m2(f"v$i%04d"))
    assert(newIds.forall(_ > boundary + 49), "new ids above the old max")
    assert(newIds.toSet.size == 100)
    // Int truncation would collide ids 2^31-50+i with their wrapped
    // negatives; prove the full 200-id set survives a round trip
    // through the bitmap state with exact cardinality and intersection
    val ids = m2.values.toSeq.toDF("id")
    val st = ids.agg(Measures.bitmapAgg(col("id")).as("st"))
    assert(st.select(Measures.bitmapCount(col("st")).as("n"))
      .head().getLong(0) == 200L)
    val lo = ids.filter(col("id") < boundary)
      .agg(Measures.bitmapAgg(col("id")).as("a"))
    val hi = ids.filter(col("id") >= boundary - 10)
      .agg(Measures.bitmapAgg(col("id")).as("b"))
    val overlap = lo.crossJoin(hi)
      .select(Measures.bitmapAndCount(col("a"), col("b")).as("n"))
      .head().getLong(0)
    assert(overlap == 10L,
      "intersection spanning the 2^31 boundary must be exact")
  }

  test("dictEncodedMeasures names exactly the measures reading a " +
      "dictionary id column") {
    // the star cube dict-encodes c_name: cname_bitmap reads c_name_id
    // (root-local ids), cust_bitmap reads the integer o_custkey (value-
    // keyed, splice-safe) - only the former is root-local state
    val c = CubeManager.defaultCube
    assert(c.dictColumns == Set("c_name"))
    assert(c.dictEncodedMeasures == Set("cname_bitmap"))
    // a cube with no dictColumns claims nothing, whatever its measures
    assert(c.copy(dictColumns = Set.empty).dictEncodedMeasures.isEmpty)
    // a measure built from a RESOLVED column (df("col") — an
    // AttributeReference, not col("col")'s UnresolvedAttribute) is
    // detected too: code-constructed members must not slip past the
    // hybrid splice guard
    val df = Tables.nation(spark, sf).withColumn("n_name_id", lit(1L))
    val resolved = Measure("res_bitmap",
      fromRaw = Measures.bitmapAgg(df("n_name_id")),
      fromState = s => Measures.bitmapUnion(col(s)))
    assert(c.copy(measures = c.measures :+ resolved,
        dictColumns = Set("n_name"))
      .dictEncodedMeasures.contains("res_bitmap"))
  }
}
