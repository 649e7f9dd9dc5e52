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
  * newer datasets go through the same memo — after that a NEW request
  * recomputes (correct, just not free). How harsh eviction is on a
  * still-held value is the hook's business: an unpersist hook degrades
  * it to recompute-on-action, while a hook that deletes checkpoint
  * files kills it outright — owners of such entries should defer the
  * destructive step (see Dedup's cluster memo) and document the
  * stronger contract. */
final class BoundedMemo[K, V](cap: Int)(onEvict: V => Unit) {
  require(cap > 0, "cap must be positive")
  private val m = scala.collection.mutable.LinkedHashMap.empty[K, V]

  /** Misses compute UNDER the monitor — deliberately. Serializing
    * misses is part of this memo's contract, not an accident: the
    * owners' computations carry global side effects that racing
    * computations would corrupt (the streaming-cube build writes a
    * DETERMINISTIC per-dataset output dir a concurrent loser would
    * delete out from under the winner; the cluster loop mutates the
    * SparkContext-global checkpoint dir, so an interleaved second
    * computation would redirect the first's checkpoint files into a
    * dir that eviction later deletes). Hit latency is untouched, and
    * the burst-per-dataset access pattern these memos see makes
    * cross-key miss concurrency worth nothing next to those failure
    * modes. A future caller that needs concurrent misses should use
    * its own memo instance with a side-effect-free compute. */
  def getOrElseUpdate(k: K, v: => V): V = synchronized {
    m.get(k) match {
      case Some(x) => x
      case None =>
        val x = v
        m.put(k, x)
        while (m.size > cap) {
          val (ek, evicted) = m.head
          m.remove(ek)
          // best-effort: a failing release must not poison the memo
          try onEvict(evicted) catch { case _: Exception => }
        }
        x
    }
  }

  def size: Int = synchronized(m.size)
}
