package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables._
import graft.Exact._
import graft.streaming.EventStream

/** SURVEY.md §2.3 — the events surface (reference stream-core windowed
  * ingest + real-time query, re-expressed over the batch `events`
  * table; the genuinely-streaming path shares the same aggregation
  * code and is exercised with MemoryStream in EventStreamSpec).
  *
  * Scale notes: every query below is a single hash-agg or window over
  * a shuffle keyed by (user_id | window), no collect, no cross join —
  * at 100 TB the events table shuffles once on the session/window key
  * and AQE handles skewed users.
  */
object EventQueries extends QueryGroup {

  val queries: Seq[Q] = Seq(

    // 37 ──────────────── tumbling-window aggregation on event time
    Q("ev_tumbling_window",
      (s, d) => EventStream.tumblingAgg(events(s, d), "1 day", "1 hour")
        .orderBy("w_start", "event_type"),
      Some("""SELECT time_bucket(INTERVAL '1 day', ts) AS w_start, event_type,
             |  COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin)),

    // 37b ─────────────── sliding-window aggregation: each event lands
    //     in windowLen/slide overlapping windows (batch form of the
    //     streaming sliding agg; the oracle replicates the overlap by
    //     fanning each event to its 2 member windows)
    Q("ev_sliding_window",
      (s, d) => EventStream.slidingAgg(events(s, d), "6 hours", "3 hours",
          "1 hour")
        .orderBy("w_start", "event_type"),
      Some("""SELECT w_start, event_type, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM (
             |  SELECT time_bucket(INTERVAL '3 hours', ts)
             |      - o.k * INTERVAL 3 HOUR AS w_start,
             |    event_type, value
             |  FROM events, (VALUES (0), (1)) o(k))
             |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin)),

    // 38 ──────────────── gap-based sessionization (60-min inactivity
    //     gap), batch form: lag → new-session flag → running sum.
    //     The streaming form (flatMapGroupsWithState) is
    //     EventStream.sessionize, spec-checked against this one.
    Q("ev_sessionize",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .withColumn("prev_us", expr("unix_micros(lag(ts, 1) over (partition by user_id order by ts, event_id))"))
          .withColumn("ns",
            when(col("prev_us").isNull ||
              expr("unix_micros(ts)") - col("prev_us") > 3600000000L, 1)
              .otherwise(0))
          .withColumn("session_id", sum(col("ns")).over(run))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
               min(col("ts")).as("session_start"),
               (expr("unix_micros(max(ts))") - expr("unix_micros(min(ts))"))
                 .as("dur_us"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH x AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN LAG(ts) OVER w IS NULL
             |         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 3600000000 THEN 1 ELSE 0 END AS ns
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, ts,
             |    CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |  FROM x)
             |SELECT user_id, session_id, COUNT(*) AS n_events,
             |  MIN(ts) AS session_start,
             |  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
             |FROM s GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // 37c ─────────────── pivot: one row per day, one count column per
    //     event type (explicit value list, so the plan is ONE hash-agg
    //     with conditional partial aggregates — no second pass to
    //     discover values, which at 100 TB is the difference between
    //     one scan and two).
    Q("ev_pivot",
      (s, d) => events(s, d)
        .withColumn("ev_day", date_format(col("ts"), "yyyy-MM-dd"))
        .groupBy("ev_day")
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("ev_day"),
      Some("""SELECT strftime(ts, '%Y-%m-%d') AS ev_day,
             |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
             |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
             |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
             |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
             |FROM events GROUP BY 1 ORDER BY ev_day""".stripMargin)),

    // 37d ─────────────── unpivot (melt): the wide day×type matrix
    //     back to long rows via the relational UNPIVOT operator —
    //     codegen'd Expand, one scan, no union-of-selects re-reads.
    Q("ev_unpivot",
      (s, d) => {
        val wide = events(s, d)
          .withColumn("ev_day", date_format(col("ts"), "yyyy-MM-dd"))
          .groupBy("ev_day")
          .pivot("event_type", Seq("click", "view"))
          .agg(count(lit(1))).na.fill(0L)
        wide.unpivot(Array(col("ev_day")),
            Array(col("click"), col("view")), "event_type", "n")
          .orderBy("ev_day", "event_type")
      },
      Some("""WITH wide AS (
             |  SELECT strftime(ts, '%Y-%m-%d') AS ev_day,
             |    COUNT(*) FILTER (WHERE event_type = 'click') AS click,
             |    COUNT(*) FILTER (WHERE event_type = 'view') AS view
             |  FROM events GROUP BY 1)
             |SELECT ev_day, 'click' AS event_type, click AS n FROM wide
             |UNION ALL
             |SELECT ev_day, 'view' AS event_type, view AS n FROM wide
             |ORDER BY ev_day, event_type""".stripMargin)),

    // 38c ─────────────── as-of attach (attribution): each purchase
    //     joined to the SAME user's most recent prior click — the
    //     as-of-join family done Spark-first: no join at all, one
    //     window pass per user partition carrying the last click
    //     forward (shuffle by user_id only; at 100 TB this beats a
    //     range join by never materializing candidate pairs).
    Q("ev_asof_attach",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        events(s, d)
          .withColumn("last_click_us",
            last(when(col("event_type") === "click",
              expr("unix_micros(ts)")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("last_click_us"),
            (expr("unix_micros(ts)") - col("last_click_us")).as("gap_us"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, ts, last_click_us,
             |  epoch_us(ts) - last_click_us AS gap_us
             |FROM (
             |  SELECT event_id, user_id, ts, event_type,
             |    last_value(CASE WHEN event_type = 'click'
             |        THEN epoch_us(ts) END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS last_click_us
             |  FROM events)
             |WHERE event_type = 'purchase'
             |ORDER BY event_id""".stripMargin)),

    // 38b ─────────────── native session windows: Spark's built-in
    //     session_window (the streaming-capable form — the same
    //     groupBy runs under a watermark in append mode, state scoped
    //     to open sessions). Semantics differ from the lag formulation
    //     at the exact boundary: session_window OPENS a new session at
    //     gap ≥ 1h (window is [start, last+gap)), where #38's lag test
    //     splits only at gap > 1h — the oracle replays the ≥ form.
    Q("ev_session_window",
      (s, d) => events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"))
        .orderBy("user_id", "session_start"),
      Some("""WITH x AS (
             |  SELECT user_id, ts,
             |    CASE WHEN LAG(ts) OVER w IS NULL
             |         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
             |            >= 3600000000 THEN 1 ELSE 0 END AS ns
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, ts,
             |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM x)
             |SELECT user_id, MIN(ts) AS session_start,
             |  MAX(ts) + INTERVAL 1 HOUR AS session_end,
             |  COUNT(*) AS n_events
             |FROM s GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    // 39 ──────────────── streaming-equivalent windowed agg: the SAME
    //     function the streaming cube runs (watermark is a no-op on
    //     batch), oracle-checked here, MemoryStream-checked in the spec
    Q("ev_stream_equiv",
      (s, d) => EventStream.tumblingAgg(events(s, d), "6 hours", "1 hour")
        .orderBy("w_start", "event_type"),
      Some("""SELECT time_bucket(INTERVAL '6 hours', ts) AS w_start,
             |  event_type, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin)),

    // 39b ─────────────── the REAL streaming path end-to-end: events as
    //     a file-source stream → watermark → windowed agg → append-mode
    //     parquet cuboid (only watermark-closed windows land on disk);
    //     the oracle recomputes exactly the closed-window set
    Q("ev_streaming_cube",
      (s, d) => {
        val path = EventStream.ensureStreamingCube(s, d)
        s.read.parquet(path).orderBy("w_start", "event_type")
      },
      Some("""SELECT time_bucket(INTERVAL '6 hours', ts) AS w_start,
             |  event_type, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events
             |GROUP BY 1, 2
             |HAVING time_bucket(INTERVAL '6 hours', ts) + INTERVAL 6 HOUR
             |  <= (SELECT MAX(ts) - INTERVAL 1 HOUR FROM events)
             |ORDER BY w_start, event_type""".stripMargin)),

    // 39c ─────────────── a SECOND cube, over events (multi-cube
    //     engine): day-granular residual pruning + bitmap user counts
    //     routed from pre-aggregated state
    Q("ev_cube_route",
      (s, d) => {
        val inst = graft.cube.CubeManager.ensureEventsBuilt(s, d)
        val r = graft.cube.QueryRouter.route(s, inst, graft.cube.CubeQuery(
          Seq("event_type"),
          Seq("n_events" -> "n_events", "value_sum" -> "sum_value",
              "user_bitmap" -> "n_users"),
          timeRange = Some(("2024-01-10", "2024-01-20"))))(
          sys.error("expected events-cube routing"))
        assert(!r.fallback, "expected events-cube routing")
        r.df.orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             |  COUNT(DISTINCT user_id) AS n_users
             |FROM events
             |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // 39d ─────────────── transparent SQL routing of the EVENTS cube:
    //     measure recognition is metadata-driven (Measure.answers), so
    //     the same front-end that routes graft_star routes any
    //     registered cube view (reference TableScanPlan.scala:43-51 —
    //     realization chosen per model, not hardcoded)
    Q("ev_sql_route",
      (s, d) => {
        val r = graft.cube.GraftSql.sqlVia(s, d,
          """SELECT ev_day, count(*) AS n_events,
            |  count(distinct user_id) AS n_users
            |FROM graft_events
            |GROUP BY ev_day
            |ORDER BY ev_day""".stripMargin)
        assert(r.routed && r.via == "cuboid",
          s"expected the events cube to route, got ${r.via}")
        r.df
      },
      Some("""SELECT strftime(ts, '%Y-%m-%d') AS ev_day,
             |  COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
             |FROM events GROUP BY 1 ORDER BY ev_day""".stripMargin)),

    // 39f ─────────────── lambda/hybrid query: historical days answered
    //     by the BATCH events cube, the fresh tail by the STREAMING
    //     cuboid, unioned and re-aggregated (the reference's real-time
    //     query path unions historical segments with receiver
    //     fragments — stream-core query). Window sums round-trip
    //     through DECIMAL(18,2) so the re-sum stays order-independent
    //     and hash-exact.
    Q("ev_hybrid",
      (s, d) => {
        val inst = graft.cube.CubeManager.ensureEventsBuilt(s, d)
        val hist = graft.cube.QueryRouter.route(s, inst, graft.cube.CubeQuery(
          Seq("event_type"),
          Seq("n_events" -> "n_events", "value_sum" -> "sum_value"),
          timeRange = Some(("2024-01-01", "2024-01-10"))))(
          sys.error("expected events-cube routing")).df
        // the ONE memoized streaming build (shared with
        // ev_streaming_cube — the lambda architecture has a single
        // speed layer, not one per query): sealed windows from the
        // append cuboid UNION the freshest in-watermark hot rows
        // (VERDICT r7 item 5 — events inside the watermark are
        // queryable; here every 6h window in [01-10, 01-20) is sealed,
        // data runs to 01-30, so the read stays deterministic)
        val (closedPath, hotPath) = EventStream.ensureLambda(s, d)
        val tail = EventStream.lambdaWindows(s, closedPath, hotPath)
          .filter(col("w_start") >= lit("2024-01-10").cast("timestamp") &&
                  col("w_start") < lit("2024-01-20").cast("timestamp"))
          .select(col("event_type"), col("n_events"), col("sum_value"))
        hist.select(col("event_type"), col("n_events"), col("sum_value"))
          .unionByName(tail)
          .groupBy("event_type")
          .agg(sum(col("n_events")).as("n_events"),
               sum(dec(col("sum_value"))).cast(DoubleType).as("sum_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events
             |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-20'
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // 39i ─────────────── DECLARATIVE streaming cube (VERDICT r15
    //     item 3): the speed layer deployed entirely from a JSON
    //     document — source SPI, window, lateness, hot tail — with no
    //     compiled definition; the lambda read (sealed append cuboid
    //     ∪ freshest in-watermark hot rows) serves EVERY window, so
    //     the batch recompute at the document's own cadence is the
    //     exact oracle (reference: stream-core real-time cubes are
    //     the same CubeDesc document family)
    Q("ev_stream_declared",
      (s, d) => {
        val spec = graft.cube.CubeJson.parse(declaredEventsDoc)
        graft.cube.CubeJson.declaredLambda(s, d, spec)
          .select("w_start", "event_type", "n_events", "sum_value")
          .orderBy("w_start", "event_type")
      },
      Some("""SELECT time_bucket(INTERVAL '12 hours', ts) AS w_start,
             |  event_type, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2
             |ORDER BY w_start, event_type""".stripMargin)),

    // 40 ──────────────── strict-order funnel view → click → purchase:
    //     stage N counts users whose first qualifying stage-N event is
    //     after their first qualifying stage-(N-1) event
    Q("ev_funnel",
      (s, d) => {
        val ev = events(s, d)
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("t1"))
        val c = ev.join(v, "user_id")
          .filter(col("event_type") === "click" && col("ts") > col("t1"))
          .groupBy("user_id").agg(min(col("ts")).as("t2"))
        val p = ev.join(c, "user_id")
          .filter(col("event_type") === "purchase" && col("ts") > col("t2"))
          .groupBy("user_id").agg(min(col("ts")).as("t3"))
        v.select(lit("l1_view").as("stage"), col("user_id"))
          .union(c.select(lit("l2_click"), col("user_id")))
          .union(p.select(lit("l3_purchase"), col("user_id")))
          .groupBy("stage").agg(count(lit(1)).as("n_users"))
          .orderBy("stage")
      },
      Some("""WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
             |          WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
             |      JOIN v ON e.user_id = v.user_id
             |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
             |p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
             |      JOIN c ON e.user_id = c.user_id
             |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
             |SELECT stage, COUNT(*) AS n_users FROM (
             |  SELECT 'l1_view' AS stage, user_id FROM v
             |  UNION ALL SELECT 'l2_click', user_id FROM c
             |  UNION ALL SELECT 'l3_purchase', user_id FROM p)
             |GROUP BY stage ORDER BY stage""".stripMargin))
  )

  /** The operator-authored streaming-cube document behind
    * `ev_stream_declared` (and DeclaredStreamingSpec): batch layer =
    * the compiled events cube's shape, speed layer = a NON-default
    * 12h/2h cadence pinning that the wiring reads the document. */
  val declaredEventsDoc: String =
    """{
      |  "name": "events_decl",
      |  "model": {"fact": "events"},
      |  "flatColumns": [
      |    {"name": "ts"},
      |    {"name": "ev_day", "expr": "date_format(ts, 'yyyy-MM-dd')"},
      |    {"name": "event_type"},
      |    {"name": "user_id"},
      |    {"name": "value"}
      |  ],
      |  "dims": ["ev_day", "event_type"],
      |  "measures": [
      |    {"name": "n_events", "family": "count"},
      |    {"name": "value_sum", "family": "sum", "column": "value",
      |     "decimal": true, "presentDouble": true},
      |    {"name": "user_bitmap", "family": "bitmap", "column": "user_id"}
      |  ],
      |  "segmentCol": "ts",
      |  "segments": [{"name": "s2024m1", "start": "2024-01-01",
      |                "end": "2024-02-01"}],
      |  "cuboids": [["ev_day"], ["event_type"]],
      |  "timeDim": {"name": "ev_day", "granularity": "day"},
      |  "notNull": ["value"],
      |  "streaming": {
      |    "source": "file",
      |    "window": "12 hours",
      |    "lateness": "2 hours",
      |    "hotTail": true
      |  }
      |}""".stripMargin
}
