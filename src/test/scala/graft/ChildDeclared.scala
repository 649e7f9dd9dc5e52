package graft

import org.apache.spark.sql.SparkSession

import graft.cube._

/** Test fixture main, launched AS A SEPARATE JVM by CubeJsonSpec: the
  * real fleet shape of declarative deployment — an operator dropped a
  * cube document in the store dir and a builder process committed the
  * build; THIS process must bootstrap the declaration from the conf'd
  * dir alone (no code, no register call), route the query from the
  * committed meta, and fire no build phase. Args: (defDir, sfDir,
  * query, expectRoot). Exits nonzero on any failure. */
object ChildDeclared {
  def main(args: Array[String]): Unit = {
    val Array(defDir, sfDir, query, expectRoot) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-child-declared")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.conf.set(GraftSql.CubeDefDirConf, defDir)
      val r = GraftSql.sqlVia(spark, sfDir, query)
      require(r.routed && r.via == "cuboid",
        s"child: declared cube must route, got ${r.via}")
      val files = r.df.inputFiles
      require(files.nonEmpty && files.forall(_.contains(expectRoot)),
        s"child: expected scans under $expectRoot, got " +
          files.take(3).mkString(", "))
      require(r.df.count() > 0, "child: empty result")
      require(CubeBuilder.phaseTotals.isEmpty,
        s"child: a build phase fired on what must be a pure metadata " +
          s"load: ${CubeBuilder.phaseTotals}")
      println("CHILD_DECLARED_OK")
    } finally spark.stop()
  }
}
