package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pluggable stream-source abstraction (reference: stream-core's
  * ISource/IStreamingSource SPI with stream-source-kafka/.../KafkaSource
  * .java as the production implementation — the receiver cluster binds
  * a cube to a source by config, not code). A source yields an
  * unbounded DataFrame with the canonical event schema; everything
  * downstream (tumbling cube append, sessionization) is
  * source-agnostic. */
trait StreamSource {
  /** the unbounded event frame: (event_id, ts TIMESTAMP, user_id,
    * event_type, value, props) */
  def load(spark: SparkSession): DataFrame
}

object StreamSource {
  /** wire schema of one event as produced upstream: `ts` is epoch
    * NANOS (pyarrow's parquet default, and what a JSON producer with
    * nanosecond clocks emits); sources convert to a micros timestamp */
  val wireSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** nanos long → TimestampType micros (integer div — nanos overflow a
    * double's mantissa) */
  def tsFromNanos(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** normalize whatever `ts` form a source surfaced — epoch-nanos long,
    * TIMESTAMP_NTZ (Spark 4's reading of a non-UTC-adjusted parquet
    * timestamp), or already a timestamp — to plain TimestampType, same
    * contract as Tables.events (session timezone is pinned UTC, so the
    * NTZ cast preserves the instant) */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => tsFromNanos(df)
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _ => df
  }
}

/** File-directory source — what a Kafka topic is to the reference's
  * receiver cluster; new parquet files landing in `srcDir` are the
  * micro-batch input. The driver-generated single-file events table is
  * exposed through a symlink (file streams only accept directories). */
final case class FileEventSource(sfDir: String, srcDir: String)
    extends StreamSource {
  def load(spark: SparkSession): DataFrame = {
    val dir = java.nio.file.Paths.get(srcDir)
    java.nio.file.Files.createDirectories(dir)
    val link = dir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(link,
        java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    // file streams need an explicit schema; probe the actual on-disk
    // one with a batch read (ts arrives nanos-long or NTZ depending on
    // the generator's pyarrow — normalizeTs canonicalizes either)
    val onDisk = spark.read.parquet(srcDir).schema
    StreamSource.normalizeTs(
      spark.readStream.schema(onDisk).parquet(srcDir))
  }
}

/** Wraps an already-constructed streaming frame (MemoryStream in
  * specs, or any custom reader) as a source. */
final case class FrameSource(df: DataFrame) extends StreamSource {
  def load(spark: SparkSession): DataFrame = df
}

/** Kafka topic source (reference: stream-source-kafka KafkaSource.java
  * — the reference's production ingest): subscribes to `topic` and
  * JSON-decodes each record value into the canonical event schema.
  * Requires the standard spark-sql-kafka connector on the classpath at
  * deployment (not bundled in this build's test container, so specs
  * exercise `decodeJson` on batch frames — the streaming plumbing is
  * identical to the file source's). */
final case class KafkaEventSource(bootstrapServers: String, topic: String,
                                  startingOffsets: String = "earliest")
    extends StreamSource {
  def load(spark: SparkSession): DataFrame = {
    KafkaEventSource.requireConnector()
    KafkaEventSource.decodeJson(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load())
  }
}

object KafkaEventSource {
  /** the connector's registered DataSourceRegister implementation —
    * present iff spark-sql-kafka is on the classpath */
  private val ProviderClass =
    "org.apache.spark.sql.kafka010.KafkaSourceProvider"

  /** Fail loud and NAMED when the Kafka connector jar is missing: a
    * misconfigured deployment otherwise surfaces Spark's raw
    * "Failed to find data source: kafka" ClassNotFound at stream start,
    * with no hint which artifact to ship. The refusal names the exact
    * jar so an operator can fix the deployment without reading Spark
    * internals. */
  private[streaming] def requireConnector(): Unit =
    if (!connectorPresent) throw new IllegalStateException(
      "KafkaEventSource requires the spark-sql-kafka connector on the " +
        s"classpath ($ProviderClass not found). Deploy " +
        "org.apache.spark:spark-sql-kafka-0-10_2.13 matching this " +
        "build's Spark version, or use FileEventSource/FrameSource.")

  def connectorPresent: Boolean =
    try { Class.forName(ProviderClass); true }
    catch { case _: ClassNotFoundException => false }

  /** kafka record frame (key/value binary, ...) → canonical event
    * frame; works identically on batch frames, which is how the spec
    * checks it without a broker */
  def decodeJson(raw: DataFrame): DataFrame =
    StreamSource.tsFromNanos(
      raw.select(from_json(col("value").cast(StringType),
          StreamSource.wireSchema).as("e"))
        .select("e.*"))
}
