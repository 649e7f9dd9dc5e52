package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.internal.SQLConf

/** Per-thread SQLConf override for the serving path. Spark's planner
  * rules read `SQLConf.get`, which consults a thread-local override
  * before the shared session conf — so a query server can plan ONE
  * query with its own `spark.sql.shuffle.partitions` without mutating
  * the session that concurrent handler threads share. (The reference
  * reached the same per-query effect through its fork's
  * `sessionState.conf.setLocalProperty`, ResultPlan.scala:86; stock
  * Spark 4 keeps the thread-local behind private[sql], hence this
  * bridge file in the org.apache.spark.sql package tree.) */
object ConfBridge {
  def withShufflePartitions[T](spark: SparkSession, n: Option[Int])
                              (f: => T): T = n match {
    case None => f
    case Some(p) =>
      val cloned = spark.sessionState.conf.clone()
      cloned.setConfString(SQLConf.SHUFFLE_PARTITIONS.key, p.toString)
      SQLConf.withExistingConf(cloned)(f)
  }
}
