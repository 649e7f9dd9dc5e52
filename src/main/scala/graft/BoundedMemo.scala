package graft

/** A small bounded memo for the per-JVM caches (VERDICT r8 item 6):
  * `getOrElseUpdate` semantics with insertion-order (FIFO) eviction
  * once `cap` entries exist, and an eviction hook so the owner can
  * release the entry's pinned resources (unpersist a cached frame,
  * delete a checkpoint dir). A long-lived session working through many
  * datasets otherwise pins cached blocks and checkpoint files forever.
  *
  * FIFO rather than LRU on purpose: these memos see a burst of hits
  * per dataset and then move on, so the stalest dataset is the right
  * victim and the structure stays trivial. The contract eviction
  * imposes on callers: a memoized frame must be consumed before `cap`
  * newer datasets go through the same memo — after that it recomputes
  * (correct, just not free).
  */
final class BoundedMemo[K, V](cap: Int)(onEvict: V => Unit) {
  require(cap > 0, "cap must be positive")
  private val m = scala.collection.mutable.LinkedHashMap.empty[K, V]

  /** The monitor guards only map state — the value computation and the
    * eviction hooks (multi-job Spark work, filesystem deletes) run
    * OUTSIDE it, so misses on distinct keys stay concurrent. Two
    * threads racing the SAME key may both compute; the loser's value
    * is released through onEvict and the winner's is returned — the
    * same at-most-one-cached guarantee, without serializing every miss
    * behind the slowest computation. */
  def getOrElseUpdate(k: K, v: => V): V = {
    synchronized(m.get(k)) match {
      case Some(x) => x
      case None =>
        val x = v
        val (ret, toRelease) = synchronized {
          m.get(k) match {
            case Some(winner) => (winner, List(x))
            case None =>
              m.put(k, x)
              val ev = List.newBuilder[V]
              while (m.size > cap) {
                val (ek, evicted) = m.head
                m.remove(ek)
                ev += evicted
              }
              (x, ev.result())
          }
        }
        // best-effort: a failing release must not poison the memo
        toRelease.foreach(e => try onEvict(e) catch { case _: Exception => })
        ret
    }
  }

  def size: Int = synchronized(m.size)
}
