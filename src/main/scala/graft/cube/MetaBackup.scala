package graft.cube

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Metadata backup / restore (reference: tool/extractor
  * CubeMetaExtractor.java exports cube metadata, CubeMetaIngester.java
  * re-ingests it; operators run the pair for rollback and migration).
  * graft's whole metadata surface is the per-cube `meta*.json` commit
  * files — the parquet itself is immutable-once-committed — so a
  * backup is a point-in-time copy of those files under
  * `<root>/_backups/<id>/`, and a restore writes them back over the
  * live paths with the same write-tmp-then-rename protocol as
  * `CubeMeta.save`.
  *
  * Composition with the rest of the lifecycle is the point:
  *  - restore IS a metadata commit, so every serving JVM's
  *    stamp-aware `ensure*` ([[MetaStamp]]) notices the buildId drift
  *    on its next query and reloads — metadata rollback needs no
  *    restarts anywhere in the fleet;
  *  - segments a rolled-back meta no longer references become exactly
  *    the orphans [[StorageCleaner]] sweeps after its grace window —
  *    rollback then GC is the complete undo of a bad append.
  */
object MetaBackup {

  private def backupsDir(root: String) = new Path(s"$root/_backups")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** every committed meta file under `root`: (cubeDirName, fileName) */
  private def metaFiles(fs: FileSystem,
                        root: String): Seq[(String, String)] =
    fs.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName != "_backups")
      .flatMap { d =>
        Seq(CubeMeta.MetaFile, CubeMeta.MergedFile)
          .filter(f => fs.exists(new Path(d.getPath, f)))
          .map(f => (d.getPath.getName, f))
      }

  private def copy(fs: FileSystem, from: Path, to: Path): Unit = {
    val in = fs.open(from)
    val bytes = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      Iterator.continually(in.read(chunk)).takeWhile(_ > 0)
        .foreach(n => buf.write(chunk, 0, n))
      buf.toByteArray
    } finally in.close()
    // tmp-then-rename, the same torn-read protection as CubeMeta.save
    val tmp = new Path(to.toString + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (fs.exists(to)) fs.delete(to, false)
    if (!fs.rename(tmp, to))
      throw new java.io.IOException(s"backup copy failed: $from -> $to")
  }

  /** Snapshot every cube's committed meta under `root`; returns the
    * backup id. Ids sort chronologically (zero-padded epoch millis +
    * uniquifier). */
  def backup(spark: SparkSession, root: String): String = {
    val fs = fsOf(spark, new Path(root))
    val id = f"${System.currentTimeMillis()}%016d-" +
      java.util.UUID.randomUUID().toString.take(8)
    val files = metaFiles(fs, root)
    require(files.nonEmpty,
      s"nothing to back up: no committed meta under $root")
    files.foreach { case (cube, file) =>
      copy(fs, new Path(s"$root/$cube/$file"),
        new Path(s"$root/_backups/$id/$cube/$file"))
    }
    id
  }

  /** backup ids under `root`, oldest first */
  def list(spark: SparkSession, root: String): Seq[String] = {
    val dir = backupsDir(root)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted
  }

  /** Restore `backupId`'s meta files over the live paths. Returns the
    * restored live paths. Serving JVMs pick the rollback up through
    * their stamp checks — no restart.
    *
    *  - `cubes`: restore ONLY the named cube dirs (operator-scoped
    *    rollback). Refuses names the backup does not hold.
    *  - A cube whose live dir is GONE (migrated away or decommissioned
    *    since the backup) is SKIPPED by default: restoring its meta
    *    would resurrect a committed-looking cube over parquet that no
    *    longer exists — and downstream tools (StorageCleaner) would
    *    then treat live-looking segments as referenced. Naming such a
    *    cube in `cubes` overrides the skip (the operator is asserting
    *    the storage is back); compose with [[HealthCheck.check]] after
    *    any restore — it flags every missing layout piece.
    *  - `pointInTime=true` makes the restore a true whole-root
    *    rollback: live meta files of cube dirs ABSENT from the backup
    *    (cubes first committed after it) are DELETED, so nothing
    *    committed after the snapshot stays routable. Off by default
    *    (per-file overwrite-only), and incompatible with a `cubes`
    *    filter — a scoped restore must not silently decommission
    *    unrelated cubes. */
  def restore(spark: SparkSession, root: String, backupId: String,
              cubes: Option[Set[String]] = None,
              pointInTime: Boolean = false): Seq[String] = {
    require(cubes.isEmpty || !pointInTime,
      "point-in-time restore is whole-root: drop the cube filter")
    val src = new Path(backupsDir(root), backupId)
    val fs = fsOf(spark, src)
    require(fs.exists(src), s"no such backup: $backupId under $root")
    val backedUp = fs.listStatus(src).filter(_.isDirectory)
      .map(_.getPath.getName).toSet
    cubes.foreach(c => require((c -- backedUp).isEmpty,
      s"backup $backupId holds no meta for ${(c -- backedUp).mkString(", ")}"))
    val restored = Seq.newBuilder[String]
    fs.listStatus(src).filter(_.isDirectory).foreach { cubeDir =>
      val name = cubeDir.getPath.getName
      val selected = cubes.forall(_.contains(name))
      val present = fs.exists(new Path(s"$root/$name"))
      val explicit = cubes.exists(_.contains(name))
      if (selected && (present || explicit)) {
        fs.listStatus(cubeDir.getPath).filter(_.isFile).foreach { f =>
          val live = new Path(s"$root/$name/${f.getPath.getName}")
          copy(fs, f.getPath, live)
          restored += live.toString
        }
      }
    }
    if (pointInTime) {
      // decommit cubes born after the snapshot: delete their live meta
      // (their parquet becomes StorageCleaner-sweepable orphans)
      metaFiles(fs, root).foreach { case (cube, file) =>
        if (!backedUp.contains(cube))
          fs.delete(new Path(s"$root/$cube/$file"), false): Unit
      }
    }
    val out = restored.result()
    require(out.nonEmpty, s"backup $backupId is empty")
    out
  }
}
