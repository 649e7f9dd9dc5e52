package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated star schema + pipeline tables
  * (see TESTDATA.md). One parquet dir per table under the sf dir.
  *
  * Scale notes: at 100 TB these reads become multi-file partitioned
  * scans; nothing here assumes single-file layout. Dim tables
  * (region/nation/supplier/part/customer) are broadcast-sized at any
  * realistic scale factor relative to the fact table and are joined
  * with an explicit `broadcast(...)` hint at call sites.
  */
object Tables {
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = tbl(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = tbl(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = tbl(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = tbl(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = tbl(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = tbl(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = tbl(s, d, "region")
  /** events.parquet's `ts` arrives in whichever physical form the
    * generator's pyarrow picked: TIMESTAMP(NANOS) (surfaced as a long
    * under spark.sql.legacy.parquet.nanosAsLong, set in every session
    * builder here), TIMESTAMP(MICROS) without UTC adjustment (surfaced
    * as TIMESTAMP_NTZ by Spark 4's reader), or a UTC-adjusted
    * timestamp. Normalize at the loader so every query sees a plain
    * TimestampType `ts`:
    *  - nanos-long → integer `div` 1000 (nanos ≈ 1.7e18 overflows a
    *    double's 53-bit mantissa, so no floating-point division);
    *  - NTZ → cast to TimestampType — the session timezone is pinned
    *    UTC in every builder, so the instant equals the oracle's
    *    naive reading of the same file. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = tbl(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = tbl(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = tbl(s, d, "embeddings")
}

/** Oracle-parity helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running
  * the paired SQL. Double summation is not associative, so any
  * parallel sum over raw doubles is nondeterministic run-to-run; we
  * route money/quantity aggregates through DECIMAL (exact, order-
  * independent) and only cast back to double at the end — the final
  * decimal→double cast is deterministic and identical on both engines.
  */
object Exact {
  val D18: DecimalType = DecimalType(18, 2)
  val D4: DecimalType  = DecimalType(4, 2)
  /** exact decimal view of a 2-dp money/quantity double column */
  def dec(c: Column): Column = c.cast(D18)
  /** small-range 2-dp factor (discount/tax) */
  def dec4(c: Column): Column = c.cast(D4)
  /** order-independent SUM of a 2-dp double, returned as double */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
  /** exact average: decimal sum cast to double / count */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(c)
  /** l_extendedprice * (1 - l_discount), exact */
  def discPrice(ext: Column, disc: Column): Column =
    dec(ext) * (lit(1) - dec4(disc))
  /** l_extendedprice * (1 - l_discount) * (1 + l_tax), exact */
  def charge(ext: Column, disc: Column, tax: Column): Column =
    dec(ext) * (lit(1) - dec4(disc)) * (lit(1) + dec4(tax))
}
