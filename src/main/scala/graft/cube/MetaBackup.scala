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
    * their stamp checks — no restart. */
  def restore(spark: SparkSession, root: String,
              backupId: String): Seq[String] = {
    val src = new Path(backupsDir(root), backupId)
    val fs = fsOf(spark, src)
    require(fs.exists(src), s"no such backup: $backupId under $root")
    val restored = Seq.newBuilder[String]
    fs.listStatus(src).filter(_.isDirectory).foreach { cubeDir =>
      fs.listStatus(cubeDir.getPath).filter(_.isFile).foreach { f =>
        val live = new Path(
          s"$root/${cubeDir.getPath.getName}/${f.getPath.getName}")
        copy(fs, f.getPath, live)
        restored += live.toString
      }
    }
    val out = restored.result()
    require(out.nonEmpty, s"backup $backupId is empty")
    out
  }
}
