package graft.cube

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s.DefaultFormats
import org.json4s.jackson.Serialization

/** Fleet-shared (L2) query-result cache — a storage-backed tier under
  * a conf-chosen dir so ONE serving JVM's computed result serves the
  * whole fleet (reference: cache/src/main/java/org/apache/kylin/cache/
  * cachemanager/MemcachedCacheManager.java:46 with
  * RemoteLocalFailOverCacheManager.java — a remote shared cache with
  * the in-process cache as the local failover tier). graft's in-JVM
  * persist cache (GraftSql.sqlCached) is the L1 over this: L1 hit →
  * replay persisted blocks; L1 miss → L2 lookup; both miss → compute,
  * write through.
  *
  * An entry is keyed on the CONTENT that determines the answer — the
  * canonicalized query plan and the realization stamp set (each
  * registered realization root's committed buildId, read from the
  * shared store, so the key means the same thing in every process) —
  * hashed to one directory name:
  *
  * {{{ <dir>/entries/<sha256(sfDir|plan|stamps)>/payload/  (parquet)
  *                                              /entry.json (commit) }}}
  *
  * `entry.json` is written LAST (tmp-then-rename), so a reader that
  * sees it sees a complete payload; a crash mid-write leaves an
  * entry-less payload dir that the FIFO prune sweeps. A foreign
  * metadata commit (build/append/refresh/merge in any process) changes
  * that realization's buildId, changing every affected key — the stale
  * entry is never addressed again and ages out of the FIFO bound.
  * Fallback (unrouted) results are never written: a raw-scan answer is
  * not invalidation-tracked by any stamp.
  *
  * Scale: entries are post-aggregation results (cuboid-cell scale, not
  * fact scale); the payload read on a hit touches ONLY the cache dir —
  * zero Spark jobs against cube or source parquet. The FIFO bound
  * (`spark.graft.fleetCacheEntries`, default 256) is enforced
  * opportunistically after each store, newest-kept by entry mtime,
  * like QueryLog's bounded store.
  */
object FleetCache {

  /** unset ⇒ the tier is off (zero I/O) */
  val DirConf = "spark.graft.fleetCacheDir"
  val CapConf = "spark.graft.fleetCacheEntries"
  val DefaultCap = 256
  /** optional BYTE budget over committed payloads (VERDICT r15
    * item 6): the entry-count FIFO bounds cardinality but 256 ×
    * worst-case payload was an unplanned storage budget — with this
    * set, prune keeps the newest entries whose cumulative payload
    * bytes fit (always at least the newest one), oldest-first
    * eviction like the count cap. Payload sizes ride entry.json. */
  val BytesConf = "spark.graft.fleetCacheBytes"
  /** prune floor: even under the caps, sweep every Nth store so
    * foreign processes' entries (invisible to this JVM's counters)
    * still age the torn-dir garbage out */
  val PruneEvery = 64L
  /** an over-cap entry is deleted only once it is at least this old:
    * a frame handed out by lookup/store reads its payload LAZILY, so
    * deleting a just-served entry from another process could fail that
    * reader's action mid-query. The grace bounds the exposure to
    * queries still running after this window (the FIFO cap is then
    * enforced with a delay, never violated for long). */
  val ReadGraceConf = "spark.graft.fleetCacheReadGraceMs"
  val DefaultReadGraceMs = 600000L

  def dirOf(spark: SparkSession): Option[String] =
    spark.conf.getOption(DirConf).filter(_.nonEmpty)

  private def capOf(spark: SparkSession): Int =
    spark.conf.getOption(CapConf).map(_.toInt).getOrElse(DefaultCap)

  /** one cached answer, as read back from the shared store */
  final case class Hit(df: org.apache.spark.sql.DataFrame, via: String,
                       estRows: Option[Long],
                       route: Option[(String, Set[String])])

  private final case class EntryJson(query: String, via: String,
      estRows: Option[Long], schemaJson: String,
      routeCube: Option[String], routeDims: Option[Seq[String]],
      createdMs: Long,
      /** committed payload size — the byte-budget prune's input
        * (absent on pre-budget entries: they weigh 0 and age out via
        * the count FIFO) */
      payloadBytes: Option[Long] = None)

  private implicit val fmts: DefaultFormats = DefaultFormats

  /** In-JVM approximation of a dir's committed state — the prune GATE
    * (ADVICE r15 / VERDICT item 6): without it every cache-miss write
    * paid one listStatus plus one getFileStatus per entry (O(cap) FS
    * calls ≈ 257 at the default cap) just to usually delete nothing.
    * Seeded by the first prune's own listing, bumped per local store;
    * prune now runs only when the counters say a cap is plausibly
    * exceeded, or on the [[PruneEvery]] floor. Approximate on purpose:
    * foreign writers are invisible until the next real sweep, which
    * the floor bounds — an over-cap dir is a delayed delete, never a
    * correctness issue. */
  private final class DirStats {
    val count = new java.util.concurrent.atomic.AtomicLong(-1L)
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val sincePrune = new java.util.concurrent.atomic.AtomicLong(0L)
    /** entry dir → payload bytes, fed by local stores and by sweeps'
      * own reads — at the entry-count cap (the steady state of a busy
      * dir, where a sweep runs per store) a byte-budget sweep would
      * otherwise re-open every entry.json every time; with the cache
      * it reads only entries this JVM has never seen (foreign
      * writers') */
    val sizes =
      scala.collection.concurrent.TrieMap.empty[String, Long]
  }
  private val dirStats =
    scala.collection.concurrent.TrieMap.empty[String, DirStats]
  /** observability + spec probe: how many sweeps actually ran */
  private[graft] val pruneRuns =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private def byteBudget(spark: SparkSession): Option[Long] =
    spark.conf.getOption(BytesConf).map(_.toLong)

  def keyHash(sfDir: String, planCanon: String,
              stamps: Seq[(String, String, String)]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val text = s"$sfDir $planCanon ${stamps.mkString(" ")}"
    md.digest(text.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  private def entryDir(dir: String, key: String) = s"$dir/entries/$key"

  /** serve `key` from the shared store, or None. Any read failure —
    * torn entry, concurrently-pruned payload — is a miss, never an
    * error on the query hot path. */
  def lookup(spark: SparkSession, dir: String, key: String): Option[Hit] =
    scala.util.Try {
      val ed = entryDir(dir, key)
      val ep = new Path(s"$ed/entry.json")
      val fs = ep.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(ep)) None
      else {
        val in = fs.open(ep)
        val text =
          try {
            val buf = new java.io.ByteArrayOutputStream()
            val chunk = new Array[Byte](8192)
            Iterator.continually(in.read(chunk)).takeWhile(_ > 0)
              .foreach(n => buf.write(chunk, 0, n))
            buf.toString(StandardCharsets.UTF_8.name())
          } finally in.close()
        val e = Serialization.read[EntryJson](text)
        // touch the entry (best-effort): the prune's read-grace keys
        // on entry.json mtime, so a hit refreshes the clock and a
        // hot entry is never the FIFO victim while readers keep
        // coming — LRU-ish where the store supports setTimes; on
        // object stores the grace degrades to commit age
        scala.util.Try(
          fs.setTimes(ep, System.currentTimeMillis(), -1)): Unit
        // schema pinned in the entry: a zero-row payload has no part
        // files to infer from, and inference would be an extra
        // footer-listing pass anyway
        val schema = DataType.fromJson(e.schemaJson).asInstanceOf[StructType]
        val df = spark.read.schema(schema).parquet(s"$ed/payload")
        Some(Hit(df, e.via, e.estRows,
          e.routeCube.map(c => (c, e.routeDims.getOrElse(Nil).toSet))))
      }
    }.toOption.flatten

  /** Write-through: materialize the routed result as the entry's
    * parquet payload (this IS the miss's compute), commit entry.json
    * last, prune to the FIFO bound, and return a frame reading the
    * payload — so the caller's L1 tier replays cache files, not a
    * recompute. A lost write race (another process committed the same
    * key first) serves the winner's entry. Any write failure degrades
    * to the computed frame — the cache must never fail a query. */
  def store(spark: SparkSession, dir: String, key: String,
            df: org.apache.spark.sql.DataFrame, via: String,
            estRows: Option[Long], route: Option[(String, Set[String])],
            query: String): org.apache.spark.sql.DataFrame =
    scala.util.Try {
      val ed = entryDir(dir, key)
      val payload = new Path(s"$ed/payload")
      val fs = payload.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new Path(s"$ed/entry.json"))) {
        // another process already committed this key
        lookup(spark, dir, key).map(_.df).getOrElse(df)
      } else {
        val tmp = new Path(s"$dir/tmp/${java.util.UUID.randomUUID()}")
        df.write.mode("overwrite").parquet(tmp.toString)
        fs.mkdirs(payload.getParent)
        // Hadoop rename into an EXISTING directory moves the source
        // INSIDE it and returns true (ADVICE r15) — a lost payload race
        // would nest our tmp under the winner's part files and a later
        // entry.json commit would serve corrupted rows. Probe for the
        // winner first, and after the rename re-check for the nested
        // landing (the winner's dir can appear between probe and
        // rename); in both cases back our files out and serve theirs.
        val lostRace =
          if (fs.exists(payload)) { fs.delete(tmp, true); true }
          else if (!fs.rename(tmp, payload)) { fs.delete(tmp, true); true }
          else {
            val nested = new Path(payload, tmp.getName)
            if (fs.exists(nested)) { fs.delete(nested, true); true }
            else false
          }
        if (lostRace) {
          lookup(spark, dir, key).map(_.df).getOrElse(df)
        } else {
          val pBytes = scala.util.Try(
            fs.getContentSummary(payload).getLength).toOption
          val e = EntryJson(query, via, estRows, df.schema.json,
            route.map(_._1), route.map(_._2.toSeq.sorted),
            System.currentTimeMillis(), payloadBytes = pBytes)
          val ejTmp = new Path(s"$ed/entry.json.tmp")
          val out = fs.create(ejTmp, true)
          try out.write(
            Serialization.write(e).getBytes(StandardCharsets.UTF_8))
          finally out.close()
          fs.rename(ejTmp, new Path(s"$ed/entry.json"))
          // prune GATE: O(1) bookkeeping per store; the O(cap) sweep
          // runs only when a cap is plausibly exceeded (or the floor)
          val st = dirStats.getOrElseUpdate(dir, new DirStats)
          // keyed on the entry dir NAME (the sha key) — the same form
          // prune's listing yields
          pBytes.foreach(b => st.sizes.put(key, b): Unit)
          if (st.count.get() < 0L) prune(spark, dir) // seed from listing
          else {
            st.count.incrementAndGet(): Unit
            pBytes.foreach(b => st.bytes.addAndGet(b): Unit)
            val overCap = st.count.get() > capOf(spark)
            val overBytes = byteBudget(spark).exists(st.bytes.get() > _)
            if (overCap || overBytes ||
                st.sincePrune.incrementAndGet() >= PruneEvery)
              prune(spark, dir)
          }
          spark.read.schema(df.schema).parquet(payload.toString)
        }
      }
    }.getOrElse(df)

  /** Bounded sweep: keep the newest committed entries (by entry.json
    * mtime) that fit BOTH the entry-count cap and, when conf'd, the
    * payload byte budget (always at least the newest one); delete the
    * rest — plus any payload dir whose entry.json never landed
    * (crashed writer) once it is old enough that no writer can still
    * be mid-commit. Opportunistic and crash-safe: every delete is of
    * an entry a re-miss can recompute. Reseeds the in-JVM counters
    * from its own listing, so the store-side gate stays honest. */
  def prune(spark: SparkSession, dir: String): Unit = scala.util.Try {
    pruneRuns.incrementAndGet(): Unit
    val cap = capOf(spark)
    val budget = byteBudget(spark)
    val root = new Path(s"$dir/entries")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val now = System.currentTimeMillis()
    val entries = fs.listStatus(root).toSeq.map { st =>
      val ej = new Path(st.getPath, "entry.json")
      val mtime = scala.util.Try(fs.getFileStatus(ej).getModificationTime)
        .getOrElse(-1L)
      (st.getPath, mtime)
    }
    val readGrace = spark.conf.getOption(ReadGraceConf).map(_.toLong)
      .getOrElse(DefaultReadGraceMs)
    val (committed, torn) = entries.partition(_._2 >= 0)
    def bytesOf(p: Path): Long = scala.util.Try {
      val in = fs.open(new Path(p, "entry.json"))
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Serialization.read[EntryJson](text).payloadBytes.getOrElse(0L)
    }.getOrElse(0L)
    val st = dirStats.getOrElseUpdate(dir, new DirStats)
    val newestFirst = committed.sortBy(-_._2)
    // newest-kept under both caps; per-entry payload sizes come from
    // the in-JVM cache (fed by local stores and previous sweeps) —
    // entry.json is opened only for entries this JVM has never seen,
    // and only when a budget is actually set
    val sizes: Map[Path, Long] =
      if (budget.isEmpty) Map.empty
      else newestFirst.map { case (p, _) =>
        p -> st.sizes.getOrElseUpdate(p.getName, bytesOf(p))
      }.toMap
    val keep = budget match {
      case None => newestFirst.take(cap)
      case Some(b) =>
        var cum = 0L
        newestFirst.zipWithIndex.takeWhile { case ((p, _), i) =>
          cum += sizes(p)
          i == 0 || (i < cap && cum <= b)
        }.map(_._1)
    }
    val keepSet = keep.map(_._1).toSet
    val kept = scala.collection.mutable.ArrayBuffer(keep: _*)
    newestFirst.filterNot(e => keepSet(e._1)).foreach { case (p, m) =>
      if (now - m > readGrace) {
        fs.delete(p, true): Unit
        st.sizes.remove(p.getName): Unit
      }
      else kept += ((p, m)) // over-cap but read-grace-protected: still
                            // on disk, count it so the gate re-fires
    }
    // a torn dir older than 10 minutes is a crashed writer's leavings
    torn.foreach { case (p, _) =>
      val age = now - fs.getFileStatus(p).getModificationTime
      if (age > 600000L) fs.delete(p, true): Unit
    }
    st.count.set(kept.size.toLong)
    st.bytes.set(kept.map(e => sizes.getOrElse(e._1, 0L)).sum)
    st.sincePrune.set(0L)
  }: Unit

  /** observability: committed entry count (specs + ops) */
  def entryCount(spark: SparkSession, dir: String): Int = scala.util.Try {
    val root = new Path(s"$dir/entries")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) 0
    else fs.listStatus(root).count(st =>
      fs.exists(new Path(st.getPath, "entry.json")))
  }.getOrElse(0)
}
