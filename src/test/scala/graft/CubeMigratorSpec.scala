package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cube._

/** Cross-root migration (reference: tool CubeMigrationCLI — staging →
  * prod promotion of meta + segment data + snapshots + dicts, with
  * CubeMigrationCheckCLI as the post-move verification). */
class CubeMigratorSpec extends AnyFunSuite {
  import TestSpark._

  private def freshRoot(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft-migrate-$tag").toString

  private def revenueByType(inst: CubeInstance): Map[String, Double] =
    QueryRouter.route(spark, inst, CubeQuery(
      Seq("event_type"), Seq("value_sum" -> "v")))(fail("expected cuboid"))
      .df.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap

  test("a migrated cube serves identical results at the destination " +
      "and passes the post-move health check") {
    val srcRoot = freshRoot("src")
    val dstRoot = freshRoot("dst")
    val cube = CubeManager.eventsCube
    val src = CubeBuilder.build(spark,
      CubeManager.eventsFlat(spark, sf), cube, srcRoot)
    val want = revenueByType(src)
    // source garbage (a crashed build's orphan) must NOT travel —
    // migration walks the meta's resource list, not the raw dir
    val orphan = new java.io.File(s"$srcRoot/events/s_orphan/cuboid=3")
    assert(orphan.mkdirs())

    val dst = CubeMigrator.migrate(spark, cube, srcRoot, dstRoot)
    assert(!new java.io.File(s"$dstRoot/events/s_orphan").exists(),
      "unreferenced source dirs must stay behind")
    assert(dst.root == dstRoot)
    assert(dst.rows == src.rows,
      "per-(segment,cuboid) row stats must travel with the meta")
    assert(revenueByType(dst) == want)
    // CubeMigrationCheckCLI analogue: the standing audit agrees the
    // copy is complete (every cuboid dir, stats, no garbage)
    assert(HealthCheck.check(spark, cube, dstRoot).isEmpty)
  }

  test("an already-committed destination refuses without overwrite " +
      "and replaces with it") {
    val srcRoot = freshRoot("ow-src")
    val dstRoot = freshRoot("ow-dst")
    val cube = CubeManager.eventsCube
    CubeBuilder.build(spark, CubeManager.eventsFlat(spark, sf), cube,
      srcRoot)
    CubeMigrator.migrate(spark, cube, srcRoot, dstRoot)
    intercept[IllegalStateException] {
      CubeMigrator.migrate(spark, cube, srcRoot, dstRoot)
    }
    val again = CubeMigrator.migrate(spark, cube, srcRoot, dstRoot,
      overwrite = true)
    assert(HealthCheck.check(spark, cube, again.root).isEmpty)
  }

  test("the wide star cube migrates with snapshots, dicts, and the " +
      "merged realization") {
    // the shared build root has everything: derived-dim snapshots,
    // the c_name dict tree, meta-merged.json — every copy path runs
    val src = CubeManager.ensureBuilt(spark, sf)
    val dstRoot = freshRoot("star-dst")
    val dst = CubeMigrator.migrate(spark, src.cube, src.root, dstRoot)
    assert(dst.rows == src.rows)
    // derived-dim snapshots and the dict tree arrived
    val fs = new org.apache.hadoop.fs.Path(dstRoot).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    src.cube.derived.map(_.lookup).distinct.foreach { l =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(
        Snapshot.path(dstRoot, l))), s"snapshot $l missing at dst")
    }
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dstRoot/dict")),
      "dict tree missing at dst")
    // the merged realization's meta traveled as a byte-copy, so its
    // base-buildId link still matches the (also byte-copied) primary
    val merged = CubeMeta.load(spark, src.cube, dstRoot,
      CubeMeta.MergedFile)
    val mergedAtSrc = CubeMeta.load(spark, src.cube, src.root,
      CubeMeta.MergedFile)
    assert(merged.isDefined == mergedAtSrc.isDefined,
      "merged realization must travel iff the source has one")
    // post-move verification: the audit sees a complete copy
    assert(HealthCheck.check(spark, src.cube, dstRoot).isEmpty)
    // and a routed aggregate answers identically
    val q = CubeQuery(Seq("o_orderstatus"), Seq("revenue" -> "rev"))
    val want = QueryRouter.route(spark, src, q)(fail("expected cuboid"))
      .df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = QueryRouter.route(spark, dst, q)(fail("expected cuboid"))
      .df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want)
  }

  test("a source without committed meta refuses") {
    intercept[IllegalStateException] {
      CubeMigrator.migrate(spark, CubeManager.eventsCube,
        freshRoot("empty"), freshRoot("never"))
    }
  }
}
