package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cube._

/** VERDICT r14 item 3: metadata/auxiliary cleanup — dictionary
  * versions, backup retention, orphan snapshots (reference: tool/
  * MetadataCleanupJob.java:29). Storage-bill-sized at fleet scale:
  * every one of these trees grows forever without a sweeper. */
class MetaCleanupSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-metagc-$tag").toString

  private def age(f: java.io.File): Unit =
    assert(f.setLastModified(System.currentTimeMillis() - 48L * 3600 * 1000))

  /** a tiny committed cube over nation with a derived dim, so the
    * snapshot sweep has truth to read */
  private def miniCube(root: String): CubeDef = {
    val cube = CubeDef("mini", Seq("n_name"),
      Seq(Measure("nrows", fromRaw = count(lit(1)),
        fromState = s => sum(col(s)), answers = Some(SqlAgg.CountAll))),
      segmentCol = "d",
      segments = Seq(Segment("all", "1995-01-01", "1996-01-01")),
      cuboids = Seq(Set("n_name")),
      derived = Seq(DerivedDim("n_regionkey", "n_name", "nation")))
    Snapshot.ensure(spark, Tables.nation(spark, sf), root, "nation")
    val flat = Tables.nation(spark, sf)
      .withColumn("d", lit("1995-06-01").cast("timestamp"))
    CubeBuilder.build(spark, flat, cube, root)
    cube
  }

  test("old dictionary versions are reclaimed; ids stay append-stable " +
      "against the kept version") {
    val root = tmpRoot("dict")
    Dictionary.buildOrAppend(spark, Seq("a", "b").toDF("c"), "c", root)
    Dictionary.buildOrAppend(spark,
      Seq("a", "b", "x", "y").toDF("c"), "c", root)
    assert(Dictionary.latestVersion(spark, root, "c") == 2)
    val before = Dictionary.load(spark, root, "c").get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val v1 = new java.io.File(s"$root/dict/c/v1")
    age(v1)
    // the grace clock runs from the SUPERSESSION (v2's creation) — age
    // it so v1 is reclaimable
    age(new java.io.File(s"$root/dict/c/v2"))

    val rep = MetaCleanup.clean(spark, root, Nil, graceMs = 1000)
    assert(rep.dictRemoved == Seq("file:" + v1.getPath) && !v1.exists())
    assert(new java.io.File(s"$root/dict/c/v2").exists(),
      "the newest version must survive")

    // encoded states stay green: every id unchanged, and a further
    // append still assigns strictly above — the kept version IS the
    // full dictionary
    val after = Dictionary.load(spark, root, "c").get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before)
    Dictionary.buildOrAppend(spark, Seq("z").toDF("c"), "c", root)
    val v3 = Dictionary.load(spark, root, "c").get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(before.forall { case (k, v) => v3(k) == v },
      "append after the sweep must keep every existing id")
    assert(v3("z") > before.values.max)
  }

  test("backups prune to the newest N; a kept id still restores") {
    val root = tmpRoot("backups")
    val cube = miniCube(root)
    val ids = (1 to 3).map { _ =>
      val id = MetaBackup.backup(spark, root)
      Thread.sleep(5) // distinct epoch-millis prefixes
      id
    }
    val rep = MetaCleanup.clean(spark, root, Seq(cube), keepBackups = 2,
      graceMs = 1000)
    assert(rep.backupsRemoved == Seq(s"$root/_backups/${ids.head}"))
    assert(MetaBackup.list(spark, root) == ids.drop(1),
      "the newest two backups must survive")
    val restored = MetaBackup.restore(spark, root, ids.last)
    assert(restored.nonEmpty, "a kept backup must still restore")
    assert(CubeMeta.load(spark, cube, root).isDefined)
  }

  test("snapshots no committed cube references are reclaimed; derived " +
      "and model lookups are pinned") {
    val root = tmpRoot("snap")
    val cube = miniCube(root) // derived pins the nation snapshot
    val stale = new java.io.File(s"$root/snapshots/stale_lookup")
    assert(stale.mkdirs())
    java.nio.file.Files.write(
      new java.io.File(stale, "part-0.parquet").toPath, "x".getBytes)
    val modelPinned = new java.io.File(s"$root/snapshots/supplier")
    assert(modelPinned.mkdirs())
    Seq(stale, modelPinned).foreach(age)
    // the snapshot grace clock runs from the newest meta commit — age
    // it so the orphan is reclaimable
    age(new java.io.File(s"$root/mini/meta.json"))

    // dry run reports all three categories without deleting
    val dry = MetaCleanup.clean(spark, root, Seq(cube),
      models = Seq(ModelDef("f", Seq(
        ModelEdge("supplier", "f", "s_suppkey", "f_suppkey")))),
      graceMs = 1000, delete = false)
    assert(dry.snapshotsRemoved == Seq("file:" + stale.getPath))
    assert(stale.exists(), "dry run must not delete")
    assert(dry.kept.exists(_.endsWith("snapshots/nation")),
      "a derived-referenced snapshot must be pinned")
    assert(dry.kept.exists(_.endsWith("snapshots/supplier")),
      "a model-edge lookup's snapshot must be pinned")

    val real = MetaCleanup.clean(spark, root, Seq(cube),
      models = Seq(ModelDef("f", Seq(
        ModelEdge("supplier", "f", "s_suppkey", "f_suppkey")))),
      graceMs = 1000)
    assert(!stale.exists() && modelPinned.exists())
    assert(new java.io.File(s"$root/snapshots/nation").exists())
    // the committed cube still loads and routes after the sweep
    val loaded = CubeMeta.load(spark, cube, root)
    assert(loaded.isDefined)
  }

  test("the snapshot sweep refuses without loadable truth") {
    val root = tmpRoot("refuse")
    miniCube(root)
    // defs are passed, but none of THEIR metas exist at this root
    intercept[IllegalStateException] {
      MetaCleanup.clean(spark, root, Seq(CubeManager.eventsCube),
        graceMs = 1000)
    }
  }

  test("fresh garbage is protected by the grace window") {
    val root = tmpRoot("grace")
    val cube = miniCube(root)
    val stale = new java.io.File(s"$root/snapshots/just_orphaned")
    assert(stale.mkdirs()) // fresh mtime
    val rep = MetaCleanup.clean(spark, root, Seq(cube), graceMs = 60000)
    assert(rep.inGrace.contains("file:" + stale.getPath) && stale.exists())
  }
}
