package graft

import org.apache.spark.sql.SparkSession

import graft.cube._

/** Test fixture main, launched AS A SEPARATE JVM by SoakSpec: the
  * MUTATOR half of the two-process concurrency soak. Given
  * (defPath, sfDir, seed, iters, logDir), it loops a seeded random mix
  * of the real lifecycle operations — append the next month segment,
  * refresh a random committed segment from source, run the declared
  * policies (auto-merge + the SPBPUS replan fed by the query log the
  * SERVING process writes) — every one through the operator CLI
  * dispatch, exactly the ops a production scheduler fires. After the
  * loop it drains any months not yet appended, so the final committed
  * state is deterministic for the parent's last-word check. Exits 0
  * only if every operation reported success. */
object ChildSoak {

  /** the seven months the soak appends after the declared m1 —
    * shared with SoakSpec so parent truth and child ops can't drift */
  val Months: Seq[(String, String, String)] = (2 to 8).map { i =>
    (s"m$i", f"1995-$i%02d-01", f"1995-${i + 1}%02d-01")
  }

  def main(args: Array[String]): Unit = {
    val Array(defPath, sfDir, seedS, itersS, logDir) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-child-soak")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // the replan policy feeds on the log the PARENT's serves write
      spark.conf.set(QueryLog.DirConf, logDir)
      val spec = CubeJson.parse(new String(
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(defPath)), "UTF-8"))
      val root = CubeManager.declaredRootOf(sfDir, spec)
      val rnd = new scala.util.Random(seedS.toLong)
      var nextAppend = 0
      def tool(a: String*): Unit = {
        val code = GraftTool.run(spark, a, s => println(s"[soak] $s"))
        require(code == 0, s"[soak] op failed (exit $code): " +
          a.mkString(" "))
      }
      def append(): Unit = {
        val (n, st, en) = Months(nextAppend); nextAppend += 1
        tool("append", sfDir, "--def", defPath,
          "--segment", s"$n,$st,$en")
      }
      def committedSegments(): Seq[String] =
        CubeMeta.load(spark, CubeJson.toCubeDef(spec), root)
          .map(_.inst.cube.segments.map(_.name))
          .getOrElse(Seq.empty)
      (0 until itersS.toInt).foreach { _ =>
        rnd.nextInt(4) match {
          // biased toward appends so the month plan usually completes
          // inside the loop and refreshes hit a growing segment list
          case 0 | 1 if nextAppend < Months.size => append()
          case 2 =>
            val segs = committedSegments()
            if (segs.nonEmpty)
              tool("refresh", sfDir, "--def", defPath,
                "--segment", segs(rnd.nextInt(segs.size)))
          case _ =>
            tool("policies", sfDir, "--def", defPath)
        }
      }
      // drain: the final committed state covers every month, so the
      // parent's last-word recount is deterministic
      while (nextAppend < Months.size) append()
      QueryLog.flush(spark, logDir)
      println("CHILD_SOAK_OK")
    } finally spark.stop()
  }
}
