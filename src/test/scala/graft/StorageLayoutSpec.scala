package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.column.statistics.BinaryStatistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

import graft.cube._

/** Sorted cuboid storage layout (reference: CubeBuildJob.java:306,317,
  * CubeMergeJob.java:96-101, Repartitioner.java:156-161 — every cuboid
  * write sorts within partitions by rowkey order): with the time dim
  * leading the dim order, parquet row-group min/max stats on it become
  * disjoint ordered slices, so a residual day filter on a partially-
  * overlapped segment prunes whole row groups at the scan instead of
  * reading the entire segment. Invisible at one-row-group test scale;
  * decisive at 100 TB — so this spec forces many row groups via
  * `graft.build.rowGroupBytes` and reads the footers directly.
  */
class StorageLayoutSpec extends AnyFunSuite {
  import TestSpark._

  private val baseDims = Set("d_day", "grp")

  /** day-grain cube: 60 days x 200 groups = 12k base-cuboid rows in
    * ONE file per cuboid with ~8 KiB row groups, so footer stats (not
    * file boundaries) carry the pruning. */
  private lazy val inst: CubeInstance = {
    val root = java.nio.file.Files.createTempDirectory("graft-layout").toString
    withLayoutConf {
      val df = spark.range(12000).selectExpr(
          "timestampadd(DAY, cast(id / 200 as int), timestamp'2024-01-01') as ts",
          "cast(id % 200 as int) as grp")
        .withColumn("d_day", date_format(col("ts"), "yyyy-MM-dd"))
        .withColumn("v", (col("grp") * 7).cast("long"))
      val cube = CubeDef("layout", Seq("d_day", "grp"),
        Seq(Measure("n", fromRaw = count(lit(1)), fromState = s => sum(col(s))),
            Measure("vs", fromRaw = sum(col("v")), fromState = s => sum(col(s)))),
        "ts",
        Seq(Segment("m1", "2024-01-01", "2024-02-01"),
            Segment("m2", "2024-02-01", "2024-03-01")),
        Seq(baseDims, Set("d_day")),
        timeDim = Some(TimeDim("d_day", d => Some(d.substring(0, 10)))))
      CubeBuilder.build(spark, df, cube, root)
    }
  }

  private def withLayoutConf[T](body: => T): T = {
    spark.conf.set("graft.build.filesPerCuboid", "1")
    spark.conf.set("graft.build.rowGroupBytes", "8192")
    try body finally {
      spark.conf.unset("graft.build.filesPerCuboid")
      spark.conf.unset("graft.build.rowGroupBytes")
    }
  }

  /** (min, max) of `column`'s stats per row group of the single parquet
    * file under `dir` */
  private def rowGroupStats(dir: String, column: String): Seq[(String, String)] = {
    val files = new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    assert(files.size == 1, s"expected one file under $dir, got ${files.size}")
    val in = HadoopInputFile.fromPath(new Path(files.head.getPath),
      spark.sparkContext.hadoopConfiguration)
    val reader = ParquetFileReader.open(in)
    try {
      reader.getFooter.getBlocks.asScala.toSeq.map { b =>
        val c = b.getColumns.asScala
          .find(_.getPath.toDotString == column)
          .getOrElse(fail(s"no column $column in footer"))
        val s = c.getStatistics.asInstanceOf[BinaryStatistics]
        (s.genericGetMin.toStringUsingUTF8, s.genericGetMax.toStringUsingUTF8)
      }
    } finally reader.close()
  }

  /** rows the parquet scan emitted (post row-group pruning) for a
    * routed result — runs the query, then reads the scan metric off the
    * final (adaptive) plan */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    // AQE wraps materialized stages as leaves — recurse through them
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case other => other.children.flatMap(scans)
    }
    val found = scans(df.queryExecution.executedPlan)
    assert(found.nonEmpty, "no file scan in the routed plan")
    found.map(_.metrics("numOutputRows").value).sum
  }

  test("cuboid writes produce multiple row groups with ordered disjoint time stats") {
    val dir = inst.cuboidPath("m1", inst.cube.cuboidId(baseDims))
    val stats = rowGroupStats(dir, "d_day")
    assert(stats.size >= 3,
      s"need several row groups to prove sortedness, got ${stats.size}")
    stats.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2,
          s"row groups out of order: max $hi1 then min $lo2 — file not sorted")
      case _ =>
    }
  }

  test("residual day filter skips row groups on the sorted segment") {
    // Jan 5-6 inside the month-grain m1 segment: partial overlap forces
    // the residual d_day filter, which parquet row-group stats answer
    val r = QueryRouter.route(spark, inst, CubeQuery(
      Seq("d_day", "grp"), Seq("n" -> "n"),
      timeRange = Some(("2024-01-05", "2024-01-07"))))(fail("no fallback expected"))
    assert(!r.fallback && r.segments == Seq("m1"))
    val total = inst.rows((("m1"), inst.cube.cuboidId(baseDims)))
    val scanned = scanRows(r.df)
    // 2 of 31 days requested: a sorted layout reads only the row groups
    // whose d_day range intersects, a fraction of the segment
    assert(scanned >= 400, s"filter must still return both days, scanned $scanned")
    assert(scanned < total / 2,
      s"scan read $scanned of $total rows — row groups not pruned " +
        "(layout unsorted or stats not pushed)")
  }

  test("merged segments are rewritten sorted (merge-path sort)") {
    val merged = withLayoutConf {
      CubeBuilder.mergeSegments(spark, inst, "mAll")
    }
    val dir = merged.cuboidPath("mAll", merged.cube.cuboidId(baseDims))
    val stats = rowGroupStats(dir, "d_day")
    assert(stats.size >= 3, s"merged file has ${stats.size} row groups")
    stats.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"merged file not sorted: $hi1 then $lo2")
      case _ =>
    }
    // and the merged answer still matches the two-segment answer
    val q = CubeQuery(Seq("grp"), Seq("vs" -> "vs"))
    val a = QueryRouter.route(spark, inst, q)(fail("n/a")).df
      .orderBy("grp").collect().toSeq
    val b = QueryRouter.route(spark, merged, q)(fail("n/a")).df
      .orderBy("grp").collect().toSeq
    assert(a == b)
  }
}
