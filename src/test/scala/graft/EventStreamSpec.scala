package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStream, FrameSource, KafkaEventSource}
import graft.streaming.EventStream.Ev

/** top-level so Spark can derive an Encoder (inner classes can't) */
case class StreamEv(ts: Timestamp, event_type: String, value: Double)

/** the Kafka connector's record schema (spark-sql-kafka's fixed
  * columns), so a MemoryStream can stand in for a broker in specs */
case class KafkaRec(key: Array[Byte], value: Array[Byte], topic: String,
                    partition: Int, offset: Long, timestamp: Timestamp,
                    timestampType: Int)

/** keyed event for the streaming-dedup spec */
case class DedupEv(event_id: Long, ts: Timestamp, event_type: String,
                   value: Double)

/** document record for the streaming ingest-QC spec */
case class StreamDoc(doc_id: Long, text: String)

/** The genuinely-streaming half of SURVEY §2.3: the same tumbling agg
  * the batch oracle checks, driven through MemoryStream with a real
  * watermark, plus the flatMapGroupsWithState sessionizer. */
class EventStreamSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(h: Double): Timestamp =
    new Timestamp(java.time.Instant.parse("2024-01-01T00:00:00Z")
      .plusMillis((h * 3600 * 1000).toLong).toEpochMilli)

  test("streaming cube append emits exactly the watermark-closed windows") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream").toString
    val path = s"$dir/cuboid"
    val ckpt = s"$dir/ckpt"

    val ms = MemoryStream[StreamEv]
    // batch 1: three events in window [0h,6h), one at 7.5h (advances the
    // watermark past 6h for the NEXT run: wm = 7.5h - 1h = 6.5h)
    ms.addData(
      StreamEv(ts(0.5), "click", 1.50), StreamEv(ts(1.0), "click", 2.25),
      StreamEv(ts(2.0), "view", 4.00), StreamEv(ts(7.5), "view", 8.00))
    val q1 = EventStream.startCubeAppend(ms.toDF(), "6 hours", "1 hour", path, ckpt)
    q1.awaitTermination()

    // run 2 resumes from the checkpointed watermark (6.5h), processes
    // the 20h event (watermark → 19h by run end), and AvailableNow
    // flushes every window now below the watermark: [0,6h) and [6,12h)
    // close; the 20h event's own window [18,24h) stays open
    ms.addData(StreamEv(ts(20.0), "click", 1.00))
    val q2 = EventStream.startCubeAppend(ms.toDF(), "6 hours", "1 hour", path, ckpt)
    q2.awaitTermination()

    val got = spark.read.parquet(path)
      .orderBy("w_start", "event_type")
      .collect()
      .map(r => (r.getAs[Timestamp]("w_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
    assert(got.toSeq == Seq(
      (ts(0), "click", 2L, 3.75),
      (ts(0), "view", 1L, 4.00),
      (ts(6), "view", 1L, 8.00)))
  }

  test("hot tail serves in-watermark windows the append cuboid can't") {
    // VERDICT r7 item 5: the freshest `lateness` of events must be
    // queryable — append mode only flushes sealed windows, the hot
    // update-mode layer carries the open ones
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-lambda").toString
    // one MemoryStream per sink: MemoryStream purges data its consumer
    // committed, so two sequential queries can't share one (the real
    // file/Kafka sources retain data and share fine)
    val msA = MemoryStream[StreamEv]
    val ms = MemoryStream[StreamEv]
    // watermark after the batch = 11.5h - 1h = 10.5h: window [0,6h)
    // seals, window [6,12h) (two events) is still inside the watermark
    val batch1 = Seq(
      StreamEv(ts(0.5), "click", 1.00), StreamEv(ts(6.5), "click", 2.00),
      StreamEv(ts(11.5), "click", 4.00))
    msA.addData(batch1)
    ms.addData(batch1)
    EventStream.startCubeAppend(msA.toDF(), "6 hours", "1 hour",
      s"$dir/cuboid", s"$dir/ckpt").awaitTermination()
    EventStream.startHotUpdate(ms.toDF(), "6 hours", "1 hour",
      s"$dir/hot", s"$dir/hot-ckpt").awaitTermination()

    val closedN = spark.read.parquet(s"$dir/cuboid")
      .agg(sum("n_events")).head().getLong(0)
    assert(closedN == 1, "append mode must not see in-watermark events")
    val lambda1 = EventStream.lambdaWindows(spark, s"$dir/cuboid", s"$dir/hot")
      .collect().map(r => (r.getAs[Timestamp]("w_start"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    assert(lambda1 == Set((ts(0), 1L, 1.00), (ts(6), 2L, 6.00)),
      s"hybrid must include the open window, got $lambda1")

    // a later batch updates the open window: latest-wins supersedes
    // the older hot row (receiver fragment replacement)
    ms.addData(StreamEv(ts(11.7), "click", 8.00))
    EventStream.startHotUpdate(ms.toDF(), "6 hours", "1 hour",
      s"$dir/hot", s"$dir/hot-ckpt").awaitTermination()
    val lambda2 = EventStream.lambdaWindows(spark, s"$dir/cuboid", s"$dir/hot")
      .collect().map(r => (r.getAs[Timestamp]("w_start"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    assert(lambda2 == Set((ts(0), 1L, 1.00), (ts(6), 3L, 14.00)),
      s"latest hot row must win, got $lambda2")
  }

  test("hot-tail compaction retires sealed windows, lambda view unchanged") {
    // VERDICT r8 item 5: after the append flush seals a window, its
    // hot rows are dead weight — compactHot must drop them without
    // changing what lambdaWindows serves
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ttl").toString
    val msA = MemoryStream[StreamEv]
    val ms = MemoryStream[StreamEv]
    // watermark after the batch = 10.5h: [0,6h) seals, [6,12h) stays hot
    val batch1 = Seq(
      StreamEv(ts(0.5), "click", 1.00), StreamEv(ts(6.5), "click", 2.00),
      StreamEv(ts(11.5), "click", 4.00))
    msA.addData(batch1)
    ms.addData(batch1)
    EventStream.startCubeAppend(msA.toDF(), "6 hours", "1 hour",
      s"$dir/cuboid", s"$dir/ckpt").awaitTermination()
    EventStream.startHotUpdate(ms.toDF(), "6 hours", "1 hour",
      s"$dir/hot", s"$dir/hot-ckpt").awaitTermination()

    def lambda(): Set[(Timestamp, Long, Double)] =
      EventStream.lambdaWindows(spark, s"$dir/cuboid", s"$dir/hot")
        .collect().map(r => (r.getAs[Timestamp]("w_start"),
          r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    val before = spark.read.parquet(s"$dir/hot").count()
    val lamBefore = lambda()
    EventStream.compactHot(spark, s"$dir/cuboid", s"$dir/hot")
    val after = spark.read.parquet(s"$dir/hot").count()
    assert(after < before,
      s"the sealed window's hot rows must retire ($before -> $after)")
    // nothing sealed survives in the hot dir
    val sealedLeft = spark.read.parquet(s"$dir/hot")
      .join(spark.read.parquet(s"$dir/cuboid")
        .select("w_start", "event_type"),
        Seq("w_start", "event_type"), "left_semi").count()
    assert(sealedLeft == 0)
    assert(lambda() == lamBefore, "compaction must not change the view")

    // the hot stream keeps appending into the compacted dir correctly
    ms.addData(StreamEv(ts(11.7), "click", 8.00))
    EventStream.startHotUpdate(ms.toDF(), "6 hours", "1 hour",
      s"$dir/hot", s"$dir/hot-ckpt").awaitTermination()
    assert(lambda() == Set((ts(0), 1L, 1.00), (ts(6), 3L, 14.00)),
      s"post-compaction updates must land, got ${lambda()}")
  }

  test("session_window streams: watermark-closed sessions emit in " +
      "append mode and match the batch answer") {
    // pins the "streaming-capable" claim behind ev_session_window: the
    // SAME groupBy(user, session_window) aggregation runs unbounded
    // with a watermark, emitting a session once no event inside the
    // lateness bound can extend it
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[DedupEv]
    val evs = Seq(
      DedupEv(1L, ts(0.0), "click", 1.0),
      DedupEv(2L, ts(0.5), "click", 1.0),   // same session (gap 0.5h)
      DedupEv(3L, ts(2.0), "click", 1.0),   // new session (gap 1.5h)
      DedupEv(4L, ts(30.0), "click", 1.0))  // watermark pusher (keeps
                                            // its own session open)
    ms.addData(evs: _*)
    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("event_type"), session_window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("event_type"), col("w.start").as("session_start"),
        col("n_events"))
    val got = scala.collection.mutable.Set.empty[(Timestamp, Long)]
    sessions(ms.toDF().withWatermark("ts", "2 hours")).writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.collect().map(r =>
          (r.getAs[Timestamp]("session_start"), r.getAs[Long]("n_events")))
        ()
      }
      .start().awaitTermination()
    // watermark 30h-2h=28h closes the first two sessions; the 30h
    // event's session stays open (no emission)
    assert(got == Set((ts(0.0), 2L), (ts(2.0), 1L)),
      s"closed sessions must match the batch grouping, got $got")
    // and the batch run of the SAME function agrees on those sessions
    val batch = sessions(evs.toDF()).collect()
      .map(r => (r.getAs[Timestamp]("session_start"),
        r.getAs[Long]("n_events"))).toSet
    assert(got.subsetOf(batch), s"batch: $batch")
  }

  test("pipeline QC columns run unchanged on an unbounded stream " +
      "(ingest-time corpus QC)") {
    // a training-data ingest pipeline filters AT THE STREAM: every
    // TextAnalysis column (token count, fingerprint, PII count,
    // scrubbing) is a pure per-row expression — no agg, no shuffle —
    // so the exact projection the batch oracle checks also types as an
    // unbounded streaming plan, batch-equivalently
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.pipeline.TextAnalysis
    val rows = Seq(
      StreamDoc(1L, "alpha beta gamma alpha"),
      StreamDoc(2L, "contact me at bob@example.com now"),
      StreamDoc(3L, "the quick brown fox"))
    def qc(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      size(TextAnalysis.words(col("text"))).cast("long").as("n_words"),
      TextAnalysis.fingerprint64(col("text")).as("fp64"),
      TextAnalysis.piiCount(col("text")).as("n_pii"),
      TextAnalysis.scrubPii(col("text")).as("clean"))
    val ms = MemoryStream[StreamDoc]
    ms.addData(rows: _*)
    val got = scala.collection.mutable.Set.empty[org.apache.spark.sql.Row]
    ms.toDF().transform(qc).writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.collect(); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    val want = qc(rows.toDF()).collect().toSet
    assert(got.toSet == want && want.size == 3,
      s"stream QC must equal batch QC: $got vs $want")
    // and the PII doc was actually scrubbed in-stream
    assert(got.exists(r => r.getAs[String]("clean").contains("<EMAIL>")))
  }

  test("compactHot with every hot window sealed leaves a readable hot " +
      "dir (ADVICE r9)") {
    // drive the append stream past EVERY hot window (the advancing
    // batch goes only to the append side, so the hot dir holds nothing
    // but sealed windows): the compacted keep-set is empty, and the
    // old rewrite would move zero files in and delete every original,
    // leaving a dir parquet cannot infer a schema from
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-allsealed").toString
    val msA = MemoryStream[StreamEv]
    val ms = MemoryStream[StreamEv]
    val batch1 = Seq(
      StreamEv(ts(0.5), "click", 1.00), StreamEv(ts(6.5), "click", 2.00))
    msA.addData(batch1)
    ms.addData(batch1)
    EventStream.startCubeAppend(msA.toDF(), "6 hours", "1 hour",
      s"$dir/cuboid", s"$dir/ckpt").awaitTermination()
    EventStream.startHotUpdate(ms.toDF(), "6 hours", "1 hour",
      s"$dir/hot", s"$dir/hot-ckpt").awaitTermination()
    // append-side only: watermark 20-6=14h seals [0,6) AND [6,12)
    msA.addData(StreamEv(ts(20), "click", 4.00))
    EventStream.startCubeAppend(msA.toDF(), "6 hours", "1 hour",
      s"$dir/cuboid", s"$dir/ckpt").awaitTermination()

    EventStream.compactHot(spark, s"$dir/cuboid", s"$dir/hot")
    // the hot dir must still be READABLE: either the rewrite produced
    // a schema-bearing (possibly empty) parquet file, or the guard
    // skipped the delete — both fine; a parquet-less dir that throws
    // "unable to infer schema" is the failure this pins (hot rows may
    // legitimately be zero: every window is sealed)
    val tail = EventStream.hotTail(spark, s"$dir/hot").collect()
    assert(tail != null)
    val lam = EventStream.lambdaWindows(spark, s"$dir/cuboid", s"$dir/hot")
      .collect().map(r => (r.getAs[Timestamp]("w_start"),
        r.getAs[Long]("n_events"))).toSet
    assert(lam == Set((ts(0), 1L), (ts(6), 1L)),
      s"sealed windows must serve from the cuboid, got $lam")
  }

  test("a kafka-schema stream decodes and builds the cube end to end") {
    // VERDICT r8 item 7: no broker in the container, so a MemoryStream
    // of Kafka-connector-schema records (key/value binary, topic,
    // partition, offset, timestamp) drives the EXACT streaming decode
    // path — decodeJson over an unbounded frame → tumbling cube append
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-kafka").toString
    def rec(off: Long, h: Double, et: String, v: Double): KafkaRec = {
      val nanos = (1704067200L + (h * 3600).toLong) * 1000000000L
      val json = s"""{"event_id":$off,"ts":$nanos,"user_id":1,""" +
        s""""event_type":"$et","value":$v,"props":"{}"}"""
      KafkaRec(null, json.getBytes("UTF-8"), "events", 0, off,
        new Timestamp(0), 0)
    }
    val ms = MemoryStream[KafkaRec]
    ms.addData(rec(0, 1.0, "click", 2.00), rec(1, 2.0, "view", 3.00),
      rec(2, 9.0, "click", 5.00))
    val decoded = graft.streaming.KafkaEventSource.decodeJson(ms.toDF())
    assert(decoded.isStreaming, "the decode must stay unbounded")
    val path = EventStream.buildStreamingCube(spark,
      graft.streaming.FrameSource(decoded), dir)
    val got = spark.read.parquet(path).orderBy("w_start", "event_type")
      .collect()
      .map(r => (r.getAs[Timestamp]("w_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
    // watermark after the batch = 9h - 1h = 8h ⇒ window [0,6h) closed
    assert(got.toSeq == Seq(
      (ts(0), "click", 1L, 2.00), (ts(0), "view", 1L, 3.00)))
  }

  test("the streaming cube builds through the pluggable source SPI") {
    // same pipeline as the file-source path, driven by a FrameSource
    // over a MemoryStream — proving the cube append is source-agnostic
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-spi").toString
    val ms = MemoryStream[StreamEv]
    ms.addData(
      StreamEv(ts(1.0), "click", 2.00), StreamEv(ts(2.0), "view", 3.00),
      StreamEv(ts(9.0), "click", 5.00))
    val path = EventStream.buildStreamingCube(spark, FrameSource(ms.toDF()), dir)
    val got = spark.read.parquet(path).orderBy("w_start", "event_type")
      .collect()
      .map(r => (r.getAs[Timestamp]("w_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
    // watermark after the batch = 9h - 1h = 8h ⇒ window [0,6h) closed
    assert(got.toSeq == Seq((ts(0), "click", 1L, 2.00), (ts(0), "view", 1L, 3.00)))
  }

  test("kafka record decoding yields the canonical event frame") {
    import spark.implicits._
    // a kafka batch frame: value carries the JSON-encoded event with
    // nanos ts — decodeJson is the same code the streaming source runs
    val nanos = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z
    val json =
      s"""{"event_id":7,"ts":$nanos,"user_id":42,"event_type":"click",
         |"value":1.5,"props":"{}"}""".stripMargin.replace("\n", "")
    val raw = Seq(json).toDF("v")
      .select(col("v").cast("binary").as("value"))
    val got = KafkaEventSource.decodeJson(raw).collect().head
    assert(got.getAs[Long]("event_id") == 7L)
    assert(got.getAs[Long]("user_id") == 42L)
    assert(got.getAs[String]("event_type") == "click")
    assert(got.getAs[Double]("value") == 1.5)
    assert(got.getAs[Timestamp]("ts") == ts(0))
  }

  test("kafka source refuses loud and named when the connector is absent") {
    // This container ships no spark-sql-kafka jar (environment-blocked,
    // VERDICT r19 "What's missing" #1): a load() must not surface
    // Spark's raw "Failed to find data source: kafka" ClassNotFound —
    // it names the exact artifact an operator has to deploy.
    assert(!KafkaEventSource.connectorPresent,
      "container unexpectedly ships the kafka connector; " +
        "update this spec to run the real source instead")
    val e = intercept[IllegalStateException] {
      KafkaEventSource("broker:9092", "events").load(spark)
    }
    assert(e.getMessage.contains("spark-sql-kafka"),
      s"refusal must name the missing artifact: ${e.getMessage}")
    assert(e.getMessage.contains("KafkaSourceProvider"))
  }

  test("streaming tumbling agg equals the batch query on the same data") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val evs = (0 until 48).map(i =>
      StreamEv(ts(i * 0.49), if (i % 2 == 0) "click" else "view", i + 0.25))

    val ms = MemoryStream[StreamEv]
    ms.addData(evs: _*)
    val q = EventStream.tumblingAgg(ms.toDF(), "6 hours", "1 hour")
      .writeStream.format("memory").queryName("agg_complete")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("agg_complete")
      .orderBy("w_start", "event_type").collect().toSeq
    val batch = EventStream.tumblingAgg(evs.toDF(), "6 hours", "1 hour")
      .orderBy("w_start", "event_type").collect().toSeq
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming sliding agg equals the batch query on the same data") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val evs = (0 until 48).map(i =>
      StreamEv(ts(i * 0.49), if (i % 2 == 0) "click" else "view", i + 0.25))

    val ms = MemoryStream[StreamEv]
    ms.addData(evs: _*)
    val q = EventStream.slidingAgg(ms.toDF(), "6 hours", "3 hours", "1 hour")
      .writeStream.format("memory").queryName("sliding_complete")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sliding_complete")
      .orderBy("w_start", "event_type").collect().toSeq
    val batch = EventStream.slidingAgg(evs.toDF(), "6 hours", "3 hours",
        "1 hour")
      .orderBy("w_start", "event_type").collect().toSeq
    assert(streamed == batch && batch.nonEmpty)
    // overlap sanity: every event lands in exactly len/slide windows
    val n = batch.map(_.getLong(2)).sum
    assert(n == evs.size * 2L, s"expected 2x fan-out, got $n")
  }

  test("streaming dedup keeps the first arrival per key, bounded state") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[DedupEv]
    val q = EventStream.dedupStream(ms.toDF(), "1 hour", Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    // batch 1: id 1 delivered twice (identical redelivery — in-batch
    // survivor order across partitions is arbitrary, the PAYLOAD is
    // what must come out once), id 2 once
    ms.addData(
      DedupEv(1L, ts(0.5), "click", 1.0), DedupEv(1L, ts(0.5), "click", 1.0),
      DedupEv(2L, ts(1.0), "view", 2.0))
    q.processAllAvailable()
    // batch 2: id 2 redelivered while still inside the watermark —
    // dropped; id 3 is new
    ms.addData(DedupEv(2L, ts(1.2), "view", 2.0),
      DedupEv(3L, ts(1.5), "click", 4.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Timestamp]("ts")))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, ts(0.5)), (2L, ts(1.0)), (3L, ts(1.5))),
      s"first arrival per key must survive, got ${got.toSeq}")
  }

  test("stateful sessionizer closes sessions on gap and on timeout") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import spark.implicits._

    val ms = MemoryStream[Ev]
    val q = EventStream.sessionize(ms.toDS(), 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    // batch 1: user 1 session of two events; user 2 session of one
    ms.addData(Ev(1L, ts(0)), Ev(1L, ts(0.25)), Ev(2L, ts(0.3)))
    q.processAllAvailable()
    // batch 2: user 1 returns after > 30min gap → closes session 1 inline
    ms.addData(Ev(1L, ts(2.0)))
    q.processAllAvailable()
    // batch 3: watermark advance (wm = 5h - 30min) fires user 2's
    // event-time timeout and will also have timed out user 1's second
    // session
    ms.addData(Ev(3L, ts(5.0)))
    q.processAllAvailable()
    // batch 4: one more watermark advance so batch-3 state times out
    ms.addData(Ev(3L, ts(8.0)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions")
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start"), r.getAs[Int]("n_events"),
        r.getAs[Long]("dur_us")))
    assert(got.contains((1L, ts(0), 2, 15L * 60 * 1000000)),
      s"user-1 first session missing from ${got.toSeq}")
    assert(got.contains((2L, ts(0.3), 1, 0L)),
      s"user-2 timed-out session missing from ${got.toSeq}")
    assert(got.contains((1L, ts(2.0), 1, 0L)),
      s"user-1 second session missing from ${got.toSeq}")
  }
}
