package graft.cube

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Cheap, memoized reads of the buildId inside a committed meta.json —
  * the staleness stamp shared by the SQL result cache
  * (GraftSql.realizationStamps) and, since round 14, by
  * CubeManager.ensure* itself, so a long-running serving JVM notices a
  * segment another process appended/merged/refreshed and reloads the
  * instance instead of routing stale segments until restart (reference:
  * core-metadata CachedCrudAssist.java reload-on-access + the
  * query-server Broadcaster/CacheService pair in server-base).
  *
  * The stamp is the meta's BUILD ID (a UUID written last in every
  * metadata commit), not the file's mtime: on stores with coarse mtime
  * granularity (object stores, whole-second NFS) two commits inside one
  * granule would leave an mtime stamp unchanged and serve a stale
  * result (ADVICE r10).
  *
  * The buildId is memoized per meta path, keyed on the file's
  * (mtime, length) from one getFileStatus (ADVICE r11: a content read
  * per realization per query is a GET per query on an object store).
  * Because buildId is a fixed-width UUID, a second commit inside the
  * same mtime granule leaves (mtime, length) unchanged — so an entry
  * may only be served once the granule has provably CLOSED. Quiescence
  * is measured in the LOCAL clock alone (ADVICE r12 — differencing the
  * local clock against the store's mtime clock made skew either trust
  * too early or disable the memo): two getFileStatus observations more
  * than [[TrustAgeMs]] apart showing the SAME (mtime, length) prove the
  * store clock has left that mtime granule — were it still inside the
  * granule at the second observation, it would have been before the
  * granule's start at the first, contradicting the first observation of
  * that mtime. Only clock RATES are assumed comparable over seconds,
  * never offsets. Promotion re-reads the content once (the pending
  * entry's read may predate a same-granule commit), then the entry is
  * trusted at getFileStatus cost until (mtime, length) moves — any
  * post-closure commit lands in a later granule and is caught by the
  * status comparison.
  */
object MetaStamp {

  /** var only so specs can shrink the quiescence window instead of
    * sleeping through it; production value stays 5s */
  private[graft] var TrustAgeMs = 5000L

  /** path → (mtime, len, buildId, firstSeenAt local ms, trusted) */
  private val memo = scala.collection.concurrent.TrieMap
    .empty[String, (Long, Long, String, Long, Boolean)]

  private val BuildIdRe = """"buildId"\s*:\s*"([^"]+)"""".r

  // test-visible counters: specs pin the no-change fast path to
  // status-only cost (one getFileStatus, zero content reads)
  private[graft] val statCalls = new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] val contentReads =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private def readBuildId(fs: FileSystem, p: Path): String = {
    contentReads.incrementAndGet()
    val in = fs.open(p)
    // meta.json is small (segments × cuboids rows); one buffered
    // read + a regex beats a full JSON bind on the query hot path
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    BuildIdRe.findFirstMatchIn(text).map(_.group(1)).getOrElse("unparsed")
  }

  /** stamp value for a meta file that provably does NOT exist — drift
    * from any real buildId (an operator deleted the meta to force a
    * rebuild; callers reload/rebuild) */
  val Absent = "absent"
  /** stamp value for a TRANSIENT read failure (store throttling, FS
    * hiccup): deliberately distinct from [[Absent]] — callers with a
    * memoized instance must keep serving it (CubeManager.stampServes)
    * rather than launch a reload or rebuild off one failed metadata
    * call; cache keys flip per call, which errs toward recompute,
    * never staleness */
  val Unavailable = "unavailable"

  /** Bound on how often a path is re-stat'ed, session conf
    * `spark.graft.meta.recheckMs` (default 0 = every call): at high
    * QPS against an object store even the steady-state getFileStatus
    * is a billable metadata round trip per query per realization —
    * the reference's CachedCrudAssist likewise serves from a timed
    * cache between reloads. A successful stamp is served from memory
    * for the window; the trade is a bounded staleness of at most
    * recheckMs before a foreign commit is noticed. Failures
    * ([[Absent]]/[[Unavailable]]) are never cached — recovery is
    * probed every call. */
  val RecheckConf = "spark.graft.meta.recheckMs"

  /** path → (last successful stamp, locally observed at ms) */
  private val lastOk =
    scala.collection.concurrent.TrieMap.empty[String, (String, Long)]

  /** The committed buildId at `p`, [[Absent] when the file is missing,
    * [[Unavailable]] on any other read failure. Steady-state cost: one
    * getFileStatus (or none inside the recheck window). */
  def buildId(spark: SparkSession, p: Path): String = {
    val recheckMs = scala.util.Try(
      spark.conf.get(RecheckConf, "0").toLong).getOrElse(0L)
    if (recheckMs > 0) {
      lastOk.get(p.toString) match {
        case Some((id, at))
            if System.currentTimeMillis() - at < recheckMs => return id
        case _ =>
      }
    }
    val id = statAndRead(spark, p)
    if (id != Absent && id != Unavailable)
      lastOk.put(p.toString, (id, System.currentTimeMillis()))
    else lastOk.remove(p.toString)
    id
  }

  private def statAndRead(spark: SparkSession, p: Path): String =
    try {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      statCalls.incrementAndGet()
      val st = fs.getFileStatus(p)
      val (mtime, len) = (st.getModificationTime, st.getLen)
      val now = System.currentTimeMillis()
      memo.get(p.toString) match {
        case Some((m, l, id, _, true)) if m == mtime && l == len => id
        case Some((m, l, _, seenAt, false)) if m == mtime && l == len &&
            now - seenAt > TrustAgeMs =>
          // the granule provably closed between the two status
          // observations — re-read once (the pending read may predate
          // a same-granule commit) and promote to trusted
          val id = readBuildId(fs, p)
          memo.put(p.toString, (mtime, len, id, seenAt, true))
          id
        case Some((m, l, _, _, false)) if m == mtime && l == len =>
          // still inside the trust window: re-read per call — the
          // window is guarded by content reads; steady-state metadata
          // is the trusted branch above
          readBuildId(fs, p)
        case _ =>
          val id = readBuildId(fs, p)
          memo.put(p.toString, (mtime, len, id, now, false))
          id
      }
    } catch {
      case _: java.io.FileNotFoundException => Absent
      case scala.util.control.NonFatal(_) => Unavailable
    }

  /** stamp of a cube realization's committed meta under `root` */
  def of(spark: SparkSession, root: String, cubeName: String,
         file: String = CubeMeta.MetaFile): String =
    buildId(spark, new Path(s"$root/$cubeName/$file"))
}
