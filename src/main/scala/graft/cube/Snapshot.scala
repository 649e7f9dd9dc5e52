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

  /** snapshot `df` under the cube root once (no-op if present) and
    * return the snapshot-backed frame. Completeness is judged by the
    * writer's own `_SUCCESS` commit marker, not bare dir existence: a
    * crashed snapshot write leaves a partial dir, and trusting it
    * would silently drop dimension rows from every later build and
    * derived-dim answer — the overwrite rewrite heals it instead. */
  def ensure(spark: SparkSession, df: DataFrame, root: String,
             name: String): DataFrame = {
    val p = new Path(path(root, name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(p, "_SUCCESS")))
      df.write.mode("overwrite").parquet(p.toString)
    spark.read.parquet(p.toString)
  }
}
