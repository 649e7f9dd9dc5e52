package graft

import org.apache.spark.sql.SparkSession

import graft.cube._

/** Test fixture main, launched AS A SEPARATE JVM by FleetCacheSpec:
  * the real fleet shape — process A (the spec) computes a routed
  * result and writes it through to the shared cache dir; process B
  * (this main) must serve the SAME query from that entry with zero
  * Spark jobs against cube parquet. Args: (fleetDir, sfDir, query).
  * Exits nonzero if the query misses the cache or touches anything
  * outside the cache dir. */
object ChildServe {
  def main(args: Array[String]): Unit = {
    val Array(fleetDir, sfDir, query) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-child-serve")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.conf.set(FleetCache.DirConf, fleetDir)
      val r = GraftSql.sqlCached(spark, sfDir, query)
      require(r.routed, "child: query did not route")
      require(r.fromCache,
        "child: expected a fleet-cache hit, got a recompute")
      // inputFiles reports nothing for persisted frames (cache-
      // substituted plan) — read scan roots off the analyzed plan
      val files =
        org.apache.spark.sql.graftbridge.ScanBridge.scanRootPaths(r.df)
      require(files.nonEmpty && files.forall(_.contains(fleetDir)),
        s"child: expected a payload-only scan, got " +
          files.take(3).mkString(", "))
      val n = r.df.count()
      require(n > 0, "child: empty cached result")
      println(s"CHILD_SERVE_OK rows=$n")
    } finally spark.stop()
  }
}
