package graft.cube

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Metadata / auxiliary-tree cleanup — the sweeps [[StorageCleaner]]
  * (per-cube segment/cuboid GC) does not cover (reference: tool/
  * MetadataCleanupJob.java:29, which sweeps aged unreferenced metadata
  * resources next to the HDFS sweep of StorageCleanupJob). Three trees
  * under a cube root grow without bound at fleet scale:
  *
  *  1. dictionary VERSIONS — [[Dictionary.buildOrAppend]] persists a
  *     new immutable `v<n>` dir per append and prunes nothing. Only
  *     the NEWEST version is ever read (append-only: it is a superset
  *     of every older one, with every id unchanged), so versions below
  *     the latest are strictly redundant — reclaimed once the
  *     SUPERSESSION is older than the grace window (the newest
  *     version's creation time, NOT the old dir's own always-old
  *     mtime), protecting a builder still reading the version that
  *     only just stopped being newest;
  *  2. `_backups/` — [[MetaBackup.backup]] appends forever; retention
  *     here keeps the newest `keepBackups` ids (they sort
  *     chronologically) and deletes the rest;
  *  3. lookup SNAPSHOTS — write-once dirs a cube's build froze; once
  *     no committed cube at this root references the lookup (through a
  *     derived dim or a declared model edge), nothing can read the
  *     snapshot again and it is reclaimed once the newest meta commit
  *     under the root — the de-referencing event — is older than the
  *     grace window (a serving process's memoized instance from
  *     before that commit may still be reading).
  *
  * Safety posture matches StorageCleaner: committed metadata is the
  * single source of truth for the snapshot sweep — when cube defs are
  * passed but none of their metas load, the sweep REFUSES rather than
  * guess; with no defs passed the snapshot sweep is skipped entirely
  * (dict/backup sweeps are truth-free: keep-latest and keep-newest-N
  * are intrinsic). `delete=false` is a dry run reporting all three.
  */
object MetaCleanup {

  final case class Report(dictRemoved: Seq[String],
      backupsRemoved: Seq[String], snapshotsRemoved: Seq[String],
      inGrace: Seq[String], kept: Seq[String], deleted: Boolean)

  /** Sweep the auxiliary trees under `root`. `cubes` are the defs that
    * may have committed metas at this root (their derived dims pin
    * snapshots); `models` are the build models whose lookup edges also
    * pin snapshots (a model lookup's snapshot feeds segment rebuilds
    * even when no derived dim reads it at query time). */
  def clean(spark: SparkSession, root: String,
            cubes: Seq[CubeDef], models: Seq[ModelDef] = Nil,
            keepBackups: Int = 8,
            graceMs: Long = StorageCleaner.DefaultGraceMs,
            delete: Boolean = true): Report = {
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val now = System.currentTimeMillis()

    val dictRemoved = Seq.newBuilder[String]
    val backupsRemoved = Seq.newBuilder[String]
    val snapshotsRemoved = Seq.newBuilder[String]
    val inGrace = Seq.newBuilder[String]
    val kept = Seq.newBuilder[String]

    def remove(p: Path,
        bucket: scala.collection.mutable.Builder[String, Seq[String]]): Unit = {
      if (now - fs.getFileStatus(p).getModificationTime < graceMs)
        inGrace += p.toString
      else {
        if (delete) fs.delete(p, true): Unit
        bucket += p.toString
      }
    }

    // ── 1. dictionary versions: keep the newest per column. The grace
    // clock starts when a version BECAME superseded — i.e. at the
    // NEWEST version's creation — not at the old version's own mtime
    // (immutable dirs are always "old" by their own clock, so an
    // own-mtime test would delete a version superseded one second ago
    // out from under a builder still reading it).
    val dictBase = new Path(s"$root/dict")
    if (fs.exists(dictBase)) {
      fs.listStatus(dictBase).filter(_.isDirectory).foreach { colDir =>
        val versions = fs.listStatus(colDir.getPath)
          .filter(st => st.isDirectory &&
            st.getPath.getName.matches("v\\d+"))
          .sortBy(_.getPath.getName.drop(1).toInt)
        if (versions.nonEmpty) {
          kept += versions.last.getPath.toString
          val supersededFor = now - versions.last.getModificationTime
          versions.dropRight(1).foreach { v =>
            if (supersededFor < graceMs) inGrace += v.getPath.toString
            else {
              if (delete) fs.delete(v.getPath, true): Unit
              dictRemoved += v.getPath.toString
            }
          }
        }
      }
    }

    // ── 2. backup retention: newest keepBackups survive ─────────────
    // (count-based and explicit — no grace window: a backup that just
    // aged past the newest N was superseded by N newer commits)
    val ids = MetaBackup.list(spark, root)
    val (old, fresh) = ids.splitAt(math.max(0, ids.size - keepBackups))
    fresh.foreach(id => kept += s"$root/_backups/$id")
    old.foreach { id =>
      val p = new Path(s"$root/_backups/$id")
      if (delete) fs.delete(p, true): Unit
      backupsRemoved += p.toString
    }

    // ── 3. snapshots nothing committed can read ─────────────────────
    val snapBase = new Path(s"$root/snapshots")
    if (fs.exists(snapBase) && cubes.nonEmpty) {
      val committed = cubes.flatMap(c => CubeMeta.load(spark, c, root))
      if (committed.isEmpty)
        throw new IllegalStateException(
          s"snapshot sweep refused: none of the ${cubes.size} cube " +
            s"defs has a loadable meta under $root — cannot tell an " +
            "orphan snapshot from a live one")
      val live: Set[String] =
        committed.flatMap(_.inst.cube.derived.map(_.lookup)).toSet ++
          models.flatMap(_.edges.map(_.lookup))
      // the grace clock for an unreferenced snapshot starts at the
      // NEWEST meta commit under the root — the de-referencing event —
      // not at the snapshot's own (write-once, always-old) mtime: a
      // serving process whose memoized instance predates that commit
      // may still be reading the snapshot
      val lastCommitMs = fs.listStatus(rootP).toSeq
        .filter(s => s.isDirectory && s.getPath.getName != "_backups")
        .flatMap(d => Seq(CubeMeta.MetaFile, CubeMeta.MergedFile)
          .flatMap(f => scala.util.Try(
            fs.getFileStatus(new Path(d.getPath, f))
              .getModificationTime).toOption))
        .foldLeft(0L)(math.max)
      fs.listStatus(snapBase).foreach { snap =>
        if (live(snap.getPath.getName)) kept += snap.getPath.toString
        else if (now - lastCommitMs < graceMs)
          inGrace += snap.getPath.toString
        else remove(snap.getPath, snapshotsRemoved)
      }
    } else if (fs.exists(snapBase)) {
      // no defs passed: nothing to judge with — keep everything
      fs.listStatus(snapBase).foreach(s => kept += s.getPath.toString)
    }

    Report(dictRemoved.result(), backupsRemoved.result(),
      snapshotsRemoved.result(), inGrace.result(), kept.result(), delete)
  }
}
