package graft

import org.apache.spark.sql.SparkSession

import graft.cube.{CubeManager, GraftSql}
import graft.functions.GraftFunctions

/** One-call setup for a session switching from the reference: SQL
  * functions registered, the star view exposed, both cubes built —
  * after this, `spark.sql` + `GraftSql.sql` + the `graft_*` functions
  * give the full engine surface. */
object GraftSession {
  def init(spark: SparkSession, sfDir: String): Unit = {
    GraftFunctions.register(spark)
    GraftSql.registerView(spark, sfDir)
    CubeManager.ensureBuilt(spark, sfDir)
    CubeManager.ensureEventsBuilt(spark, sfDir)
  }
}
