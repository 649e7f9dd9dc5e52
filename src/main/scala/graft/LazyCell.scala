package graft

/** A memoized computation forced OUTSIDE the owning memo's monitor
  * (ADVICE r21: `materialized` ran a full Spark job inside
  * BoundedMemo.getOrElseUpdate, whose misses compute under the memo's
  * synchronized block — a multi-second materialization stalled every
  * concurrent hit AND miss on that memo, contradicting its "hit
  * latency is untouched" contract).
  *
  * Pattern: `memo.getOrElseUpdate(k, new LazyCell(compute)).value` —
  * the monitor only creates/returns the cell (cheap); the FIRST caller
  * to read `.value` runs the computation under the cell's own lazy-val
  * lock, so concurrent requests for the SAME key still wait for one
  * computation (never two persists of the same frame) while requests
  * for other keys proceed.
  *
  * `ifForced` is for eviction hooks: releasing a pinned resource
  * (unpersist) must not FORCE a never-used cell just to release it.
  * The only leak window — a cell evicted before its creator forces
  * it — requires `cap` other misses between insert and the immediate
  * `.value` read, and costs one recompute-on-action frame, not
  * wrongness. */
final class LazyCell[V](thunk: => V) {
  @volatile private var forced = false
  lazy val value: V = { val v = thunk; forced = true; v }
  def ifForced(f: V => Unit): Unit = if (forced) f(value)
}
