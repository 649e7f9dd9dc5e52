package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator from SURVEY.md §2: a Spark-native implementation plus
  * (when SQL-expressible) the equivalent ANSI SQL the driver runs in
  * DuckDB over the same parquet tables. Keys and output column names
  * must match exactly between the two (driver sorts columns by name
  * and hashes values).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryGroup {
  def queries: Seq[Q]
}
