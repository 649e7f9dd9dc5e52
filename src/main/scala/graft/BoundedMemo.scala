package graft

/** A small bounded memo for the per-JVM caches (VERDICT r8 item 6):
  * `getOrElseUpdate` semantics with least-recently-USED eviction once
  * `cap` entries exist, and an eviction hook so the owner can release
  * the entry's pinned resources (unpersist a cached frame, delete a
  * checkpoint dir). A long-lived session working through many datasets
  * otherwise pins cached blocks and checkpoint files forever.
  *
  * LRU (touch-on-hit), not FIFO (VERDICT r10 item 2): a benchmark- or
  * dashboard-shaped workload interleaves one HOT dataset (the corpus
  * every key rereads) with a tail of one-shot derived frames (splits,
  * batches, eval sets). Under FIFO the hot entry's age is its INSERT
  * time, so the one-shot tail marches it out exactly when the next
  * key would have hit it — the worst possible victim. Touching on hit
  * keeps the hot entry young at one LinkedHashMap re-insert per hit.
  * The eviction contract on callers weakens only for never-hit
  * entries: a memoized frame must be USED at least once per `cap` new
  * datasets to stay resident — after eviction a new request recomputes
  * (correct, just not free). How harsh eviction is on a still-held
  * value is the hook's business: an unpersist hook degrades it to
  * recompute-on-action, while a hook that deletes checkpoint files
  * kills it outright — owners of such entries should defer the
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
    * its own memo instance with a side-effect-free compute. Owners
    * whose compute is a multi-second Spark job (the pipeline persist
    * memos) store a [[LazyCell]] instead, so the monitor only creates
    * the cell and the job runs outside it (ADVICE r21). */
  def getOrElseUpdate(k: K, v: => V): V = synchronized {
    m.remove(k) match {
      case Some(x) =>
        m.put(k, x) // touch: re-insert at the young end (LRU)
        x
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
