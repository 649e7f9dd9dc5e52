package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cube._

/** VERDICT r15 item 1: step-resumable builds (reference: core-job
  * ExecutableManager.java:52 + DefaultChainedExecutable — per-step
  * state so a crashed build resumes from the last completed step).
  * A build killed mid-cuboid-layers must, on re-entry under the lease,
  * skip every committed phase — snapshots, dictionary, materialized
  * flat table, completed cuboid dirs — rebuild only what's missing,
  * and commit the metadata ONCE at the very end. */
class BuildResumeSpec extends AnyFunSuite {
  import TestSpark._

  /** path → mtime of the parquet part files under `dir` (the rewrite
    * detector: a skipped phase leaves every byte untouched) */
  private def dataFiles(dir: java.io.File): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(dir).filter(_.getName.startsWith("part-"))
      .map(f => f.getPath -> f.lastModified).toMap
  }

  /** marker-bearing cuboid dirs under a segment dir */
  private def committedCuboids(segDir: java.io.File): Seq[java.io.File] =
    Option(segDir.listFiles).toSeq.flatten
      .filter(d => d.isDirectory &&
        new java.io.File(d, BuildJob.CuboidMarker).exists)

  private def ordersCube(name: String, extraMeasure: Boolean = false,
                         twoSegments: Boolean = false) = {
    val measures = Seq(
      Measure("n_orders", count(lit(1)), s => sum(col(s)),
        answers = Some(SqlAgg.CountAll)),
      Measure("price_sum", sum(Exact.dec(col("o_totalprice"))),
        s => sum(col(s)), _.cast("double"),
        answers = Some(SqlAgg.SumOf("o_totalprice")))) ++
      (if (extraMeasure)
        Seq(Measure("price_max", max(col("o_totalprice")),
          s => max(col(s)), answers = Some(SqlAgg.MaxOf("o_totalprice"))))
      else Nil)
    val segs =
      if (twoSegments) Seq(Segment("h1", "1992-01-01", "1997-01-01"),
        Segment("h2", "1997-01-01", "2003-01-01"))
      else Seq(Segment("all", "1992-01-01", "2003-01-01"))
    CubeDef(name, Seq("o_orderstatus", "o_orderpriority"), measures,
      "o_orderdate", segs,
      Seq(Set("o_orderstatus", "o_orderpriority"),
        Set("o_orderstatus"), Set("o_orderpriority")))
  }

  private def ordersFlat =
    Tables.orders(spark, sf).select(col("o_orderstatus"),
      col("o_orderpriority"), col("o_orderdate"), col("o_totalprice"))

  test("a build killed mid-cuboid-layers resumes from the last " +
      "committed layer: skipped dirs byte-untouched, the rest built, " +
      "meta committed once at the end") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-resume").toString
    val cube = ordersCube("resume_build")
    CubeBuilder.failAfterCuboidWrites.set(1) // base commits, child dies
    try {
      assert(intercept[IllegalStateException](
        CubeBuilder.build(spark, ordersFlat, cube, root))
        .getMessage.contains("injected build crash"))
    } finally CubeBuilder.failAfterCuboidWrites
      .set(CubeBuilder.DisarmedFailure)
    // a crashed build never publishes: no meta, job file persists
    assert(CubeMeta.load(spark, cube, root).isEmpty,
      "meta must not commit before every layer lands")
    val cubeDir = new java.io.File(s"$root/resume_build")
    assert(new java.io.File(cubeDir, BuildJob.JobFile).exists)
    val segDir = new java.io.File(cubeDir, "all")
    val done = committedCuboids(segDir)
    assert(done.size == 1, s"got ${done.map(_.getName)}")
    val before = done.map(d => d.getName -> dataFiles(d)).toMap
    assert(before.values.forall(_.nonEmpty))

    Thread.sleep(1100) // mtime resolution guard
    val resumed = CubeBuilder.build(spark, ordersFlat, cube, root)

    // the committed layer was skipped — every part file byte-untouched
    done.foreach(d =>
      assert(dataFiles(d) == before(d.getName),
        s"resume must not rewrite committed cuboid ${d.getName}"))
    // the attempt closed: job file gone, meta committed, all layers in
    assert(!new java.io.File(cubeDir, BuildJob.JobFile).exists,
      "finish must remove the job file after the meta commit")
    assert(committedCuboids(segDir).size == 3)
    assert(CubeMeta.load(spark, cube, root).nonEmpty)

    // the resumed instance is indistinguishable from an uncrashed one
    val fresh = CubeBuilder.build(spark, ordersFlat, cube,
      java.nio.file.Files.createTempDirectory("graft-resume-ref").toString)
    assert(resumed.rows == fresh.rows,
      "resumed row counts must match an uncrashed build")
    val r = QueryRouter.route(spark, resumed, CubeQuery(
      Seq("o_orderstatus"),
      Seq("price_sum" -> "price_sum", "n_orders" -> "n_orders")))(
      fail("expected cuboid"))
    val got = r.df.collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getLong(2))).toSet
    val want = ordersFlat.groupBy("o_orderstatus")
      .agg(sum(Exact.dec(col("o_totalprice"))).cast("double").as("p"),
        count(lit(1)).as("n"))
      .collect().map(x => (x.getString(0), x.getDouble(1), x.getLong(2)))
      .toSet
    assert(got == want && want.nonEmpty)
  }

  test("markers of a superseded DEFINITION are never trusted: a " +
      "def-drifted rebuild rewrites dirs the old attempt committed") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-resume-drift").toString
    CubeBuilder.failAfterCuboidWrites.set(1)
    try {
      assert(intercept[IllegalStateException](
        CubeBuilder.build(spark, ordersFlat,
          ordersCube("resume_drift"), root))
        .getMessage.contains("injected build crash"))
    } finally CubeBuilder.failAfterCuboidWrites
      .set(CubeBuilder.DisarmedFailure)
    val segDir = new java.io.File(s"$root/resume_drift/all")
    val done = committedCuboids(segDir)
    assert(done.size == 1)
    val before = dataFiles(done.head)

    Thread.sleep(1100)
    // the SAME cuboid paths under a CHANGED def (extra measure →
    // different fingerprint → fresh jobId): the old marker must not
    // satisfy the new attempt, or the layout would miss a state column
    val drifted = ordersCube("resume_drift", extraMeasure = true)
    CubeBuilder.build(spark, ordersFlat, drifted, root): Unit
    assert(dataFiles(done.head) != before,
      "a drifted def must rewrite dirs the old attempt committed")
    assert(CubeMeta.load(spark, drifted, root).nonEmpty)
  }

  test("a DECLARED cube's crashed build resumes with the committed " +
      "dictionary intact (append-stable re-run, no new version) and " +
      "cleans its attempt state on finish") {
    val spec = CubeJson.parse(
      """{
        |  "name": "resume_decl",
        |  "model": {"fact": "customer"},
        |  "flatColumns": [
        |    {"name": "c_mktsegment"},
        |    {"name": "c_nationkey"},
        |    {"name": "c_name"},
        |    {"name": "d", "expr": "CAST('1995-06-01' AS TIMESTAMP)"}
        |  ],
        |  "dims": ["c_mktsegment", "c_nationkey"],
        |  "measures": [
        |    {"name": "n_rows", "family": "count"},
        |    {"name": "cname_bitmap", "family": "bitmap",
        |     "column": "c_name_id", "answers": "countDistinct:c_name"}
        |  ],
        |  "segmentCol": "d",
        |  "segments": [{"name": "all", "start": "1995-01-01",
        |                "end": "1996-01-01"}],
        |  "cuboids": [["c_mktsegment"]],
        |  "dictColumns": ["c_name"]
        |}""".stripMargin)
    val root =
      s"${CubeManager.cubeRoot}/${sf.split('/').last}-resume_decl"
    // this test owns the declared root (persists across JVM runs)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(root)): Unit
    CubeManager.resetMemos()

    CubeBuilder.failAfterCuboidWrites.set(1)
    try {
      assert(intercept[IllegalStateException](
        CubeManager.ensureDeclared(spark, sf, spec))
        .getMessage.contains("injected build crash"))
    } finally CubeBuilder.failAfterCuboidWrites
      .set(CubeBuilder.DisarmedFailure)

    // dictionary v1 committed before the crash
    val cubeDir = new java.io.File(s"$root/resume_decl")
    val dictDir = new java.io.File(s"$root/dict/c_name")
    val dictBefore = dataFiles(dictDir)
    assert(dictBefore.nonEmpty)

    Thread.sleep(1100)
    val inst = CubeManager.ensureDeclared(spark, sf, spec) // resume

    // the resume re-runs buildOrAppend (the append-stable form IS the
    // safe resume — values arriving between crash and resume must
    // still get ids); with nothing new it appends nothing, so the
    // committed version's bytes are untouched and no v2 appears
    assert(dataFiles(dictDir) == dictBefore,
      "an unchanged source must not re-version the dictionary")
    assert(!new java.io.File(cubeDir, BuildJob.JobFile).exists,
      "finish must remove the attempt state after the meta commit")
    // the dictionary-backed bitmap answers exactly
    val r = QueryRouter.route(spark, inst, CubeQuery(
      Seq("c_mktsegment"), Seq("cname_bitmap" -> "n_cust")))(
      fail("expected cuboid"))
    val got = r.df.collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val want = Tables.customer(spark, sf).groupBy("c_mktsegment")
      .agg(countDistinct(col("c_name")).as("n"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(got == want && want.nonEmpty)
  }

  test("a crashed MERGE resumes from its last committed cuboid; a " +
      "rebuilt base invalidates the attempt's markers wholesale") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-resume-merge").toString
    val cube = ordersCube("resume_merge", twoSegments = true)
    val inst = CubeBuilder.build(spark, ordersFlat, cube, root)

    CubeBuilder.failAfterCuboidWrites.set(1)
    try {
      assert(intercept[IllegalStateException](
        CubeBuilder.mergeSegments(spark, inst, "m", inst.cube.segments))
        .getMessage.contains("injected build crash"))
    } finally CubeBuilder.failAfterCuboidWrites
      .set(CubeBuilder.DisarmedFailure)
    val mDir = new java.io.File(s"$root/resume_merge/m")
    val done = committedCuboids(mDir)
    assert(done.size == 1, s"got ${done.map(_.getName)}")
    val before = dataFiles(done.head)
    assert(new java.io.File(s"$root/resume_merge",
      BuildJob.MergeJobFile).exists)

    Thread.sleep(1100)
    val merged =
      CubeBuilder.mergeSegments(spark, inst, "m", inst.cube.segments)
    assert(dataFiles(done.head) == before,
      "resume must not re-merge the committed cuboid")
    assert(committedCuboids(mDir).size == 3)
    assert(!new java.io.File(s"$root/resume_merge",
      BuildJob.MergeJobFile).exists,
      "the attempt closes with the last cuboid")
    val r = QueryRouter.route(spark, merged, CubeQuery(
      Seq("o_orderstatus"), Seq("n_orders" -> "n")))(
      fail("expected cuboid"))
    val got = r.df.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val want = ordersFlat.groupBy("o_orderstatus").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(got == want && want.nonEmpty)

    // a base REBUILT between crash and resume (new buildId while the
    // crashed attempt's _job-merge.json still exists) changes the
    // merge identity: the old markers must not satisfy the resumed
    // attempt — they describe parquet merged from a base that no
    // longer exists
    CubeBuilder.failAfterCuboidWrites.set(1)
    try {
      assert(intercept[IllegalStateException](
        CubeBuilder.mergeSegments(spark, inst, "m2", inst.cube.segments))
        .getMessage.contains("injected build crash"))
    } finally CubeBuilder.failAfterCuboidWrites
      .set(CubeBuilder.DisarmedFailure)
    val m2Dir = new java.io.File(s"$root/resume_merge/m2")
    val done2 = committedCuboids(m2Dir)
    assert(done2.size == 1 && new java.io.File(s"$root/resume_merge",
      BuildJob.MergeJobFile).exists)
    val before2 = dataFiles(done2.head)
    CubeMeta.save(spark, inst): Unit // the base rebuild lands NOW
    Thread.sleep(1100)
    CubeBuilder.mergeSegments(spark, inst, "m2", inst.cube.segments): Unit
    assert(dataFiles(done2.head) != before2,
      "a rebuilt base must invalidate the crashed merge attempt's " +
        "markers")
  }

  test("the full star pipeline resumes past snapshots, dictionary, " +
      "and the materialized flat table — none rewritten") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-resume-star").toString
    CubeBuilder.failAfterCuboidWrites.set(2)
    try {
      assert(intercept[IllegalStateException](
        CubeManager.buildStar(spark, sf, root))
        .getMessage.contains("injected build crash"))
    } finally CubeBuilder.failAfterCuboidWrites
      .set(CubeBuilder.DisarmedFailure)
    // the crashed build SETTLED all its segment futures before
    // throwing (awaitAll's no-fail-fast contract) — no zombie writes
    // race the assertions or the resume below
    val cubeDir = new java.io.File(s"$root/star")
    val flatBefore = dataFiles(new java.io.File(s"$root/flat"))
    val dictBefore = dataFiles(new java.io.File(s"$root/dict/c_name"))
    val snapBefore = dataFiles(new java.io.File(s"$root/snapshots"))
    assert(flatBefore.nonEmpty && dictBefore.nonEmpty &&
      snapBefore.nonEmpty,
      "the coarse phases must have completed before the cuboid crash")
    val doneDirs = Option(cubeDir.listFiles).toSeq.flatten
      .filter(_.isDirectory).flatMap(committedCuboids)
    val cuboidBefore = doneDirs.map(d => d.getPath -> dataFiles(d)).toMap
    assert(CubeMeta.load(spark, CubeManager.defaultCube, root).isEmpty)

    Thread.sleep(1100)
    val resumed = CubeManager.buildStar(spark, sf, root)

    assert(dataFiles(new java.io.File(s"$root/flat")) == flatBefore,
      "resume must not rewrite the materialized flat table")
    assert(dataFiles(new java.io.File(s"$root/dict/c_name")) == dictBefore,
      "resume must not re-version the dictionary")
    assert(dataFiles(new java.io.File(s"$root/snapshots")) == snapBefore,
      "resume must not refreeze the snapshots")
    doneDirs.foreach(d =>
      assert(dataFiles(d) == cuboidBefore(d.getPath),
        s"resume must not rewrite committed cuboid ${d.getPath}"))
    // indistinguishable from the uncrashed shared-root build
    assert(resumed.rows == CubeManager.ensureBuilt(spark, sf).rows,
      "the resumed star must carry the same per-cuboid row counts")
  }
}
