package graft.cube

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Storage garbage collection (reference: server-base
  * StorageCleanupJob.java — collect HDFS paths no live cube metadata
  * references, delete behind an explicit flag; tool/StorageCleanupJob
  * is the CLI face). At 100 TB the build lifecycle sheds real garbage:
  * a crashed refresh leaves `<seg>.refreshing` staging dirs, retention
  * and re-builds leave segment dirs the committed meta no longer
  * names, lattice changes leave `cuboid=N` dirs outside the current
  * lattice, and broken build leases leave `.broken.*` remnants. None
  * of it is reachable (routing reads only meta-named paths — the
  * commit-last protocol guarantees that), but it all bills storage
  * forever unless something deletes it.
  *
  * Safety model, matching the reference job's posture:
  *  - the COMMITTED META is the single source of truth: if the primary
  *    meta does not load (absent, torn, fingerprint drift), the
  *    cleaner REFUSES — without truth, "orphan" cannot be
  *    distinguished from "the cube itself";
  *  - a GRACE window (mtime older than `graceMs`) protects in-flight
  *    work: an appending/refreshing builder writes its segment dir
  *    BEFORE its meta commit, so a freshly-written dir is never
  *    touched — only garbage that has been orphaned for the full
  *    window is deleted (the reference guards its HDFS sweep with the
  *    same recency test);
  *  - `delete=false` is a dry run: report, touch nothing (the
  *    reference's default without `-delete true`).
  *
  * The merged realization's segments count as live only while its
  * chain to the current base buildId holds — a merge of a rebuilt base
  * is itself garbage (ensureMerged would re-merge rather than read
  * it).
  */
object StorageCleaner {

  /** what a sweep decided: `removed` deleted (or would delete, dry
    * run), `inGrace` recognized as garbage but younger than the
    * window, `live` the meta-referenced set that was kept */
  final case class Report(removed: Seq[String], inGrace: Seq[String],
                          live: Seq[String], deleted: Boolean)

  val DefaultGraceMs: Long = 24L * 3600 * 1000

  /** Sweep one cube's storage under `root`. Throws
    * IllegalStateException when the primary meta is unreadable —
    * refusing is the only safe answer without truth. */
  def clean(spark: SparkSession, cube: CubeDef, root: String,
            graceMs: Long = DefaultGraceMs,
            delete: Boolean = true): Report = {
    val loaded = CubeMeta.load(spark, cube, root).getOrElse(
      throw new IllegalStateException(
        s"storage clean refused: no loadable meta for ${cube.name} " +
          s"under $root — cannot tell garbage from cube"))
    val inst = loaded.inst

    // the merged realization's segments are live only while chained
    // to the CURRENT base build
    val merged = CubeMeta.load(spark, cube, root, CubeMeta.MergedFile)
      .filter(_.baseBuildId.contains(loaded.buildId))

    val liveSegs = (inst.cube.segments.map(_.name) ++
      merged.toSeq.flatMap(_.inst.cube.segments.map(_.name))).toSet
    val liveCuboids =
      inst.cube.cuboids.map(inst.cube.cuboidId).toSet ++
        merged.toSeq.flatMap(m =>
          m.inst.cube.cuboids.map(m.inst.cube.cuboidId)).toSet

    val dir = new Path(s"$root/${cube.name}")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val now = System.currentTimeMillis()

    // cube-dir entries that are part of the protocol, never garbage
    def protocolFile(name: String): Boolean =
      name == CubeMeta.MetaFile || name == CubeMeta.MergedFile ||
        name.endsWith(".tmp") || // an in-flight meta commit's window
        (name.startsWith("_building") && !name.contains(".broken.")) ||
        // Build-attempt state (BuildJob): a surviving job file means a
        // crashed attempt awaiting step-resume — begin() overwrites it
        // and finish() deletes it on success, so it is self-healing
        // and bounded (≤3 small files + step markers per cube dir).
        // Sweeping it between crash and re-entry would silently
        // downgrade the resume to a full rebuild (ADVICE r16) — never
        // correctness, but exactly the hours-to-minutes win the
        // attempt files exist for.
        name == BuildJob.JobFile || name == BuildJob.MergeJobFile ||
        name == BuildJob.RefreshJobFile || name.startsWith("_phase.")

    val removed = Seq.newBuilder[String]
    val inGrace = Seq.newBuilder[String]
    val live = Seq.newBuilder[String]

    def sweep(p: Path, isGarbage: Boolean): Unit = {
      val st = fs.getFileStatus(p)
      if (!isGarbage) { live += p.toString; return }
      if (now - st.getModificationTime < graceMs) inGrace += p.toString
      else {
        if (delete) fs.delete(p, true): Unit
        removed += p.toString
      }
    }

    fs.listStatus(dir).foreach { entry =>
      val name = entry.getPath.getName
      if (entry.isFile) {
        if (!protocolFile(name)) sweep(entry.getPath, isGarbage = true)
        else live += entry.getPath.toString
      } else if (!liveSegs.contains(name)) {
        // staged `.refreshing` dirs from crashed refreshes land here
        // too — their names are never in the committed segment list
        sweep(entry.getPath, isGarbage = true)
      } else {
        live += entry.getPath.toString
        // inside a live segment: cuboid dirs outside the current
        // lattice are garbage (evolution only ever adds, so these are
        // from a superseded def whose fingerprint matched — rare, but
        // the reference sweeps per-cuboid for the same reason)
        fs.listStatus(entry.getPath).foreach { c =>
          val id = c.getPath.getName.stripPrefix("cuboid=")
          val garbage = !c.getPath.getName.startsWith("cuboid=") ||
            scala.util.Try(id.toLong).toOption.forall(!liveCuboids(_))
          sweep(c.getPath, garbage)
        }
      }
    }
    Report(removed.result(), inGrace.result(), live.result(), delete)
  }
}
