package graft.cube

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once lookup-table snapshots (reference: kylin-spark-engine
  * builder/DFSnapshotBuilder.scala): dimension tables are frozen under
  * the cube root at build time, so segment rebuilds and queries join
  * against the same dimension rows the cube was built with even if the
  * live source table changes between builds. */
object Snapshot {

  def path(root: String, name: String): String = s"$root/snapshots/$name"

  /** graft's OWN commit marker, written after a dir's parquet write
    * returns. Completeness gating must not key on the committer's
    * `_SUCCESS` alone: whether that file exists depends on the
    * SESSION config (mapreduce.fileoutputcommitter.marksuccessfuljobs
    * — commonly disabled on object stores), so a config flip or a
    * mixed-config fleet would read every committed dir as incomplete
    * and rewrite write-once state (for dictionaries: re-assign every
    * id). Our marker is config-independent; `_SUCCESS` is accepted
    * too so dirs written by earlier releases under the default config
    * stay trusted. */
  private[cube] val CommitMarker = "_graft_committed"

  private[cube] def markCommitted(fs: org.apache.hadoop.fs.FileSystem,
                                  dir: Path): Unit = {
    val out = fs.create(new Path(dir, CommitMarker), true)
    out.close()
  }

  private[cube] def isCommitted(fs: org.apache.hadoop.fs.FileSystem,
                                dir: Path): Boolean =
    fs.exists(new Path(dir, CommitMarker)) ||
      fs.exists(new Path(dir, "_SUCCESS"))

  /** snapshot `df` under the cube root once (no-op if present) and
    * return the snapshot-backed frame. Completeness is judged by a
    * commit marker written AFTER the write returned, not bare dir
    * existence: a crashed snapshot write leaves a partial dir, and
    * trusting it would silently drop dimension rows from every later
    * build and derived-dim answer — the overwrite rewrite heals it
    * instead. */
  def ensure(spark: SparkSession, df: DataFrame, root: String,
             name: String): DataFrame = {
    val p = new Path(path(root, name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!isCommitted(fs, p)) {
      // A NON-EMPTY dir with no commit marker is either a crashed
      // write (heal by rewrite — the desired path) or a complete
      // pre-marker snapshot written under
      // mapreduce.fileoutputcommitter.marksuccessfuljobs=false; the
      // two are indistinguishable from here, so the rewrite proceeds
      // but LOUDLY (ADVICE r16): if the old dir was whole, the
      // write-once freeze is being replaced from CURRENT source and
      // derived-dim answers change without operator action.
      if (fs.exists(p) &&
          scala.util.Try(fs.listStatus(p).nonEmpty).getOrElse(false))
        System.err.println(s"[graft-snapshot] re-freezing $p from the " +
          "current source: the dir exists with data but no commit " +
          "marker (crashed write, or a snapshot from before the " +
          "marker contract) — derived-dim answers will reflect the " +
          "CURRENT lookup rows; use rebuild() for explicit corrections")
      df.write.mode("overwrite").parquet(p.toString)
      markCommitted(fs, p)
    }
    spark.read.parquet(p.toString)
  }

  /** Rebuild `name`'s snapshot from the current `df` (reference:
    * core-dictionary dict/lookup/SnapshotManager.java:153
    * `rebuildSnapshot` + core-cube CubeManager.java:1144
    * `buildSnapshotTable` — Kylin's refresh-lookup-snapshot action):
    * freeze the corrected lookup beside the live snapshot and swap
    * whole, so every derived-dim join — queries AND later segment
    * builds — sees the corrected rows at once. [[ensure]] stays
    * write-once; this is the operator's explicit correction path.
    * Callers hold the cube's build lease and MUST commit meta
    * afterwards: serving reads the snapshot per query (no reload
    * needed), but cached RESULTS key on meta stamps and would serve
    * pre-correction answers forever. The swap renames the live
    * snapshot ASIDE instead of deleting it: the reader-failure window
    * shrinks to two metadata-only renames (a delete is O(files) on an
    * object store), every rename is CHECKED (Hadoop reports most
    * failures as a boolean — unchecked, a failed swap would commit a
    * fresh buildId claiming the correction landed while the snapshot
    * is missing), and a failed landing restores the retired copy so
    * the cube never unpublishes on a reported success. Crash windows:
    * during staging — live untouched; between the two renames — the
    * snapshot is missing but the `.retired` dir holds it whole, and
    * the next build's ensure() rewrites while a mid-window derived-dim
    * query fails loudly (never stale). */
  def rebuild(spark: SparkSession, df: DataFrame, root: String,
              name: String): Unit = {
    val live = new Path(path(root, name))
    val tmp = new Path(path(root, name) + ".rebuilding")
    val retired = new Path(path(root, name) + ".retired")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    df.write.mode("overwrite").parquet(tmp.toString)
    markCommitted(fs, tmp)
    fs.delete(retired, true) // a crashed prior swap's leftover
    if (fs.exists(live) && !fs.rename(live, retired))
      throw new IllegalStateException(
        s"snapshot swap failed: could not retire $live")
    if (!fs.rename(tmp, live)) {
      fs.rename(retired, live) // restore — the cube stays published
      throw new IllegalStateException(
        s"snapshot swap failed: could not land $tmp at $live — the " +
          "previous snapshot was restored")
    }
    fs.delete(retired, true): Unit
    // derived-filter translations memoize against this snapshot's
    // commit stamp; make the rebuild visible to the next translation
    // in this JVM even under an opt-in stamp-recheck window
    DerivedFilterTranslator.invalidateStamp(live.toString)
  }
}
