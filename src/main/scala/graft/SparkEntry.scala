package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each implemented operator registers one entry in `queries` and,
  * when SQL-expressible, a DuckDB oracle in `oracleSql`.
  */
object SparkEntry {

  /** All operator groups (SURVEY.md §2.1–§2.4). */
  private def groups: Seq[QueryGroup] =
    Seq(Relational, CubeQueries, EventQueries, TextQueries, DedupQueries,
      EmbQueries, MultimodalQueries, SourceQueries)

  private lazy val all: Seq[Q] = groups.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
