package graft

import org.apache.spark.sql.SparkSession

/** Round-16 scale evidence for step-resumable builds (SCALE_r16.json):
  * measure, at the bench scale, what a mid-cuboid-layers crash COSTS
  * with and without resume — the full star pipeline built from
  * scratch, the same pipeline killed partway through its cuboid
  * layers, and the re-entered build that skips every committed phase
  * (snapshots, dictionary, materialized flat table, marked cuboid
  * dirs). Prints ONE JSON line; the wall-clock ratio resume/full is
  * the number that scales: at 100 TB the skipped phases are hours.
  */
object ResumeProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def loadAvg(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadBefore = loadAvg()

    def tmpRoot(tag: String): String = java.nio.file.Files
      .createTempDirectory(s"graft-resume-probe-$tag").toString
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    // warmup: source parquet footers + codegen (untimed)
    cube.CubeManager.flatTable(spark, sfDir).count(): Unit

    // 1) the uncrashed baseline
    val rootFull = tmpRoot("full")
    val fullSec = timed(cube.CubeManager.buildStar(spark, sfDir, rootFull))

    // 2) crash mid-cuboid-layers (28 cuboid writes = 4 segments × 7
    //    cuboids; kill after 15 — past the flat/dict/snapshot phases,
    //    roughly halfway through the layers)
    val rootCrash = tmpRoot("crash")
    val crashAfter = 15
    cube.CubeBuilder.failAfterCuboidWrites.set(crashAfter)
    val crashSec = timed {
      try cube.CubeManager.buildStar(spark, sfDir, rootCrash)
      catch { case _: IllegalStateException => () }
    }
    cube.CubeBuilder.failAfterCuboidWrites
      .set(cube.CubeBuilder.DisarmedFailure)
    def committedCuboids(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$rootCrash/star"))
        .count(_.getName == cube.BuildJob.CuboidMarker)
    }
    val committed = committedCuboids()

    // 3) the resume: skips snapshots/dict/flat + the committed dirs
    val resumeSec = timed(
      cube.CubeManager.buildStar(spark, sfDir, rootCrash): Unit)
    val total = committedCuboids()
    val loadAfter = loadAvg()

    val json =
      s"""{"metric":"resume","sf":"$sfDir",""" +
        f""""load_before":$loadBefore%.2f,"load_after":$loadAfter%.2f,""" +
        f""""full_build_sec":$fullSec%.2f,""" +
        s""""crashed_after_writes":$crashAfter,""" +
        f""""crashed_run_sec":$crashSec%.2f,""" +
        s""""cuboids_committed_at_crash":$committed,""" +
        s""""cuboids_total":$total,""" +
        f""""resume_sec":$resumeSec%.2f,""" +
        f""""resume_over_full":${resumeSec / fullSec}%.3f}"""
    println(json)
    spark.stop()
  }
}
