package graft.cube

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Append-stable, distributed global dictionary for bitmap measures on
  * non-integer columns (reference: core-dictionary
  * AppendTrieDictionary.java:66 — "new values appended get new ids,
  * existing values keep their ids" — built on Spark in
  * kylin-spark-engine builder/DFDictionaryBuilder.scala:38 +
  * DFTableEncoder.scala; Kylin encodes a per-column global dictionary
  * so exact-distinct bitmaps can store dense ints).
  *
  * Two contracts matter at scale:
  *
  *  1. APPEND-STABLE: a rebuild after new values arrive must keep every
  *     existing value's id and assign new values ids strictly above
  *     max(existing). Otherwise bitmap states built against the old
  *     dictionary are silently corrupted on incremental append. The
  *     dictionary is therefore PERSISTED under the cube root (like the
  *     lookup snapshots) in immutable versioned directories; each
  *     `buildOrAppend` call anti-joins the incoming values against the
  *     current version and only ever appends.
  *
  *  2. DISTRIBUTED ASSIGNMENT: ids are assigned per-partition-rank +
  *     partition-offset (range-partition, sort within partitions, then
  *     zipWithIndex's count-then-offset scheme) — never a global
  *     single-partition Window sort. New-value id assignment scales to
  *     dictionary cardinalities far beyond one executor's memory.
  *
  * Within one version the assignment is deterministic (values are
  * range-partitioned and sorted, so ids follow value order); across
  * appends only injectivity and stability are guaranteed — which is
  * exactly what bitmap cardinalities need.
  */
object Dictionary {

  def dictRoot(root: String, column: String): String = s"$root/dict/$column"

  private def versionPath(root: String, column: String, v: Int): String =
    s"${dictRoot(root, column)}/v$v"

  /** Newest persisted version (0 = no dictionary yet). Listed through the
    * Hadoop FileSystem resolved from the cube root's own scheme so the
    * same code works on file://, hdfs:// and s3a:// roots — the versioned
    * parquet is written through Spark/Hadoop paths, and reading the
    * version listing through java.io would silently return 0 on any
    * non-local root, making buildOrAppend overwrite v1 and reassign ids
    * (exactly the append-stability corruption this class forbids). */
  private[graft] def latestVersion(spark: SparkSession, root: String,
                                  column: String): Int = {
    val dir = new Path(dictRoot(root, column))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir).iterator
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d+") &&
        // only COMMITTED versions count (graft's own config-
        // independent marker, written after persist's write returned;
        // the committer's _SUCCESS accepted for dirs written by
        // earlier releases): a crashed persist leaves a partial
        // newest dir, and loading it would miss values of the prior
        // version — buildOrAppend would then re-assign them NEW ids
        // above the partial max, silently corrupting every bitmap
        // state built against the old ids. Ignoring the partial falls
        // back to the last complete version (the overwrite of the
        // retry heals the dir).
        Snapshot.isCommitted(fs, st.getPath))
      .map(_.getPath.getName.drop(1).toInt)
      .foldLeft(0)(math.max)
  }

  /** the current persisted dictionary, if one exists */
  def load(spark: SparkSession, root: String, column: String): Option[DataFrame] = {
    val v = latestVersion(spark, root, column)
    if (v == 0) None
    else Some(spark.read.parquet(versionPath(root, column, v)))
  }

  /** Distributed dense id assignment for values not yet in the
    * dictionary: range-partition + sort within partitions, then
    * per-partition counts → offsets (zipWithIndex). Ids are
    * base+1 .. base+n, assigned in value order, with no global
    * single-partition sort anywhere. */
  private def assignIds(vals: DataFrame, column: String, base: Long): DataFrame = {
    val spark = vals.sparkSession
    val parts = math.max(1, spark.sparkContext.defaultParallelism)
    val sorted = vals
      .repartitionByRange(parts, col(column))
      .sortWithinPartitions(col(column))
    val schema = new StructType(sorted.schema.fields)
      .add("dict_id", LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row(r.get(0), base + i + 1) }
    spark.createDataFrame(rdd, schema)
  }

  /** One-shot (non-persistent) dictionary over the distinct values of
    * `column` — for ad-hoc use and tests. The cube build path uses
    * `buildOrAppend` so ids survive incremental appends. */
  def build(df: DataFrame, column: String): DataFrame =
    assignIds(distinctVals(df, column), column, 0L)

  private def distinctVals(df: DataFrame, column: String): DataFrame =
    df.select(col(column)).where(col(column).isNotNull).distinct()

  /** Build the dictionary for `column` under the cube root, or append
    * any values not present in the current version. Existing ids are
    * never reassigned; new values get ids > max(existing). Returns the
    * (parquet-backed) current dictionary. */
  def buildOrAppend(spark: SparkSession, df: DataFrame, column: String,
                    root: String): DataFrame = {
    val incoming = distinctVals(df, column)
    load(spark, root, column) match {
      case None =>
        persist(assignIds(incoming, column, 0L), root, column, 1)
      case Some(existing) =>
        val newVals = incoming.join(
          existing.select(col(column)), Seq(column), "left_anti")
        if (newVals.isEmpty) existing
        else {
          val base = existing.agg(max(col("dict_id"))).head().getLong(0)
          persist(existing.unionByName(assignIds(newVals, column, base)),
            root, column, latestVersion(spark, root, column) + 1)
        }
    }
  }

  /** write a new immutable version dir (commit-markered after the
    * write returns) and return it parquet-backed */
  private def persist(dict: DataFrame, root: String, column: String,
                      v: Int): DataFrame = {
    val p = versionPath(root, column, v)
    dict.write.mode("overwrite").parquet(p)
    val hp = new Path(p)
    Snapshot.markCommitted(
      hp.getFileSystem(dict.sparkSession.sparkContext.hadoopConfiguration),
      hp)
    dict.sparkSession.read.parquet(p)
  }

  /** adds `<column>_id` via the dictionary (nulls stay null). No
    * explicit broadcast hint: the dictionary is parquet-backed with
    * size statistics, so Catalyst/AQE broadcasts it while it fits the
    * threshold and falls back to a shuffle join for dictionary
    * cardinalities beyond that — the right behavior at 100 TB. */
  def encode(df: DataFrame, dict: DataFrame, column: String): DataFrame = {
    val d = dict.withColumnRenamed(column, s"__dict_$column")
    df.join(d, df(column) === d(s"__dict_$column"), "left")
      .drop(s"__dict_$column")
      .withColumnRenamed("dict_id", s"${column}_id")
  }

  def idCol(column: String): Column = col(s"${column}_id")
}
