package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): times individual
  * declared queries against the noop sink with the SAME session config
  * as Bench, attributes wall-clock to stages (executor run time,
  * shuffle bytes, task counts) via a listener, and dumps
  * `.explain("formatted")` per key to plans/<tag>/<key>_<suffix>.txt.
  *
  * Usage: runMain graft.PlanProbe <suffix> <key> [key ...]
  * (suffix e.g. "before"/"after"; plans land in plans/r21/)
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val suffix = args.headOption.getOrElse("before")
    val keys = args.drop(1).toSeq
    require(keys.nonEmpty, "usage: PlanProbe <suffix> <key> [key...]")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Bench.materialize(SparkEntry.queries("q02_agg_pricing")(spark, sfDir))
    if (keys.exists(k => k.startsWith("cube") || k.startsWith("ev_"))) {
      cube.CubeManager.ensureBuilt(spark, sfDir)
      cube.CubeManager.ensureMerged(spark, sfDir): Unit
    }

    case class St(id: Int, name: String, runMs: Long, shRead: Long,
                  shWrite: Long, tasks: Int, gcMs: Long, fetchMs: Long,
                  cpuMs: Long)
    val stages = new scala.collection.mutable.ArrayBuffer[St]
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        stages.synchronized { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          val si = s.stageInfo
          val m = si.taskMetrics
          stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(70),
            m.executorRunTime, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, si.numTasks,
            m.jvmGCTime, m.shuffleReadMetrics.fetchWaitTime,
            m.executorCpuTime / 1000000)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val planDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r22"))
    java.nio.file.Files.createDirectories(planDir)

    keys.foreach { key =>
      val fn = SparkEntry.queries.getOrElse(key,
        sys.error(s"unknown key $key"))
      spark.sparkContext.setJobDescription(s"probe:$key")
      // pass 1: warm (codegen, memos, footer caches) — timed too
      val t0 = System.nanoTime()
      Bench.materialize(fn(spark, sfDir))
      val cold = (System.nanoTime() - t0) / 1e9
      // pass 2: measured with listener cleared
      stages.synchronized { stages.clear(); jobs = 0 }
      val t1 = System.nanoTime()
      Bench.materialize(fn(spark, sfDir))
      val warm = (System.nanoTime() - t1) / 1e9
      Thread.sleep(200) // let listener events drain
      val (ss, nj) = stages.synchronized { (stages.toVector, jobs) }
      println(f"== $key  cold=$cold%.3f s  warm=$warm%.3f s  jobs=$nj  " +
        f"stages=${ss.size}  execRunSum=${ss.map(_.runMs).sum / 1e3}%.2f s")
      ss.sortBy(-_.runMs).take(12).foreach { s =>
        println(f"   stage ${s.id}%4d run=${s.runMs / 1e3}%7.3f s  " +
          f"cpu=${s.cpuMs / 1e3}%7.3f s  gc=${s.gcMs / 1e3}%6.3f s  " +
          f"fw=${s.fetchMs / 1e3}%6.3f s  tasks=${s.tasks}%3d  " +
          f"shR=${s.shRead / 1024}%8d KB  shW=${s.shWrite / 1024}%8d KB")
      }
      // plan dump
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(planDir.resolve(s"${key}_$suffix.txt"),
        txt.getBytes("UTF-8")): Unit
    }
    spark.stop()
  }
}
