package graft.cube

import org.apache.spark.sql.{Row, SparkSession}

/** Query-server execution hygiene (reference: kylin-spark-project/
  * kylin-spark-query/src/main/scala/org/apache/spark/sql/execution/
  * ResultPlan.scala:66-115 — every served query runs under a Spark job
  * group named by its query id with a scheduler pool picked from the
  * plan's scan size, so one runaway query neither blocks the cluster
  * nor becomes unkillable; SparkSqlClient.java caps returned rows).
  *
  * graft's version wraps the two programmatic serving entry points
  * (GraftSql.sqlVia / sqlCached) with:
  *  - `setJobGroup(graft-query-<id>, sql, interruptOnCancel = true)`
  *    BEFORE routing, so even the router's own metadata probes (TopN
  *    trimmed-state checks) are attributable and cancellable;
  *  - a FAIR-scheduler pool chosen AFTER routing from the plan's
  *    estimated cuboid scan rows (`SqlResult.estRows` — the estimate
  *    QueryRouter's RoutePlan carries): small routed scans share
  *    `lightweight_tasks`, big ones `heavy_tasks`, and un-routed
  *    source scans `query_pushdown` — the reference's pool names.
  *    Pools take effect under `spark.scheduler.mode=FAIR` (set it on
  *    the serving session's builder); under FIFO the property is inert
  *    but harmless.
  *  - a result-row cap enforced by collecting at most cap+1 rows
  *    (`LIMIT cap+1` — the driver never materializes an unbounded
  *    result) and REFUSING (ResultCapExceeded) when the cap is hit,
  *    Kylin's `kylin.query.max-return-rows` behavior, never silent
  *    truncation.
  *
  * `cancel(queryId)` kills every job of a served query by its group;
  * running tasks are interrupted (interruptOnCancel), so even a task
  * blocked in user code dies promptly. Job-group and pool properties
  * are thread-local in Spark, so concurrent queries must run on
  * separate threads — the standard query-server model (one handler
  * thread per session), and exactly how the Thriftserver drives the
  * shared session.
  *
  * The stock Spark Thriftserver surface (ThriftServerSpec) keeps
  * Spark's own result semantics; a JDBC deployment that needs Kylin's
  * refusal contract fronts the session with this service (the
  * reference's query server is likewise its own consumption point —
  * Kylin does not serve through Spark's Thriftserver). For driver
  * memory safety on the raw Thriftserver path, set
  * `spark.sql.thriftServer.incrementalCollect=true`.
  */
object QueryService {

  val GroupPrefix = "graft-query-"

  /** reference pool names (ResultPlan.scala) */
  val LightPool = "lightweight_tasks"
  val HeavyPool = "heavy_tasks"
  val PushdownPool = "query_pushdown"

  /** planned cuboid rows above which a routed query is scheduled in the
    * heavy pool: a million cells is no longer a few parquet row groups
    * (the reference draws the same line from its plan's partition
    * count vs the parallelism it considers "light") */
  val HeavyRowThreshold = 1000000L

  /** default result-row cap — Kylin's kylin.query.max-return-rows */
  val DefaultMaxRows = 5000000

  /** pool from the routed plan's estimated scan rows (None ⇔ fallback:
    * a raw source scan belongs in the pushdown pool regardless of
    * size, as in the reference) */
  def poolFor(estRows: Option[Long]): String = estRows match {
    case None => PushdownPool
    case Some(n) if n > HeavyRowThreshold => HeavyPool
    case _ => LightPool
  }

  final class ResultCapExceeded(val queryId: String, val cap: Int)
    extends RuntimeException(
      s"query $queryId exceeds the $cap-row result cap; refine the query " +
        "or raise maxRows")

  final class QueryCancelled(val queryId: String, cause: Throwable)
    extends RuntimeException(s"query $queryId was cancelled", cause)

  /** a served query: the collected rows plus how it was answered */
  final case class Served(queryId: String, rows: Array[Row],
      routed: Boolean, via: String, pool: String)

  /** Serve one query under full concurrency hygiene. `cached = true`
    * goes through the result cache (sqlCached); routing, pool choice,
    * cap and cancellation behave identically on both paths. */
  def run(spark: SparkSession, sfDir: String, sql: String, queryId: String,
          maxRows: Int = DefaultMaxRows, cached: Boolean = true): Served = {
    require(maxRows > 0, "maxRows must be positive")
    val sc = spark.sparkContext
    sc.setJobGroup(GroupPrefix + queryId, sql.take(256),
      interruptOnCancel = true)
    try {
      val r = if (cached) GraftSql.sqlCached(spark, sfDir, sql)
              else GraftSql.sqlVia(spark, sfDir, sql)
      val pool = poolFor(if (r.routed) r.estRows else None)
      sc.setLocalProperty("spark.scheduler.pool", pool)
      // serving-boundary: the bounded cap+1 materialization handing a
      // finished result to the client (ResultPlan.scala:94 parity)
      val rows = r.df.limit(maxRows + 1).collect() // serving-boundary: cap+1
      if (rows.length > maxRows) throw new ResultCapExceeded(queryId, maxRows)
      Served(queryId, rows, r.routed, r.via, pool)
    } catch {
      case e: Throwable if isCancellation(e) =>
        throw new QueryCancelled(queryId, e)
    } finally {
      sc.setLocalProperty("spark.scheduler.pool", null)
      sc.clearJobGroup()
    }
  }

  /** kill every job of a served query; interruptOnCancel interrupts
    * its running tasks (ResultPlan's cancelJobGroup path) */
  def cancel(spark: SparkSession, queryId: String): Unit =
    spark.sparkContext.cancelJobGroup(GroupPrefix + queryId)

  /** a cancelled job group surfaces as a SparkException whose message
    * names the cancellation (or an InterruptedException from an
    * interrupted task in the cause chain) */
  private def isCancellation(e: Throwable): Boolean = {
    var cur = e
    var depth = 0
    while (cur != null && depth < 10) {
      val msg = Option(cur.getMessage).getOrElse("")
      if (cur.isInstanceOf[InterruptedException] ||
          msg.contains("cancelled") || msg.contains("canceled"))
        return true
      cur = cur.getCause
      depth += 1
    }
    false
  }
}
