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

  /** does this session's committer write `_SUCCESS` markers? When an
    * operator disabled them (mapreduce.fileoutputcommitter.
    * marksuccessfuljobs=false — common object-store hygiene), marker-
    * gated completeness checks would read EVERY committed dir as
    * incomplete and rewrite write-once state forever — fall back to
    * the plain existence check there (accepting its original
    * crashed-partial-dir blind spot, which such a deployment has
    * already chosen) */
  private[cube] def successMarked(
      conf: org.apache.hadoop.conf.Configuration): Boolean =
    conf.getBoolean(
      "mapreduce.fileoutputcommitter.marksuccessfuljobs", true)

  /** snapshot `df` under the cube root once (no-op if present) and
    * return the snapshot-backed frame. Completeness is judged by the
    * writer's own `_SUCCESS` commit marker, not bare dir existence: a
    * crashed snapshot write leaves a partial dir, and trusting it
    * would silently drop dimension rows from every later build and
    * derived-dim answer — the overwrite rewrite heals it instead.
    * (Marker-less committer configs keep the old existence check.) */
  def ensure(spark: SparkSession, df: DataFrame, root: String,
             name: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path(root, name))
    val fs = p.getFileSystem(hconf)
    val committed =
      if (successMarked(hconf)) fs.exists(new Path(p, "_SUCCESS"))
      else fs.exists(p)
    if (!committed)
      df.write.mode("overwrite").parquet(p.toString)
    spark.read.parquet(p.toString)
  }
}
