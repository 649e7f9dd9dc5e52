package graft.cube

import scala.collection.mutable

/** Route-decision trace (reference: `query/src/main/java/org/apache/
  * kylin/query/routing/RealizationCheck.java`, populated by
  * `RealizationChooser.java` / `QueryRouter.java` with per-realization
  * incapable reasons — `CapabilityResult.IncapableType
  * .UNMATCHED_DIMENSION` / `UNMATCHED_AGGREGATION` — so the user sees
  * WHY a query hit pushdown instead of a cube, not just that it did).
  *
  * graft's routing makes the same decisions as silent `None`s; this
  * collector records them without changing a single control-flow path.
  * Collection is thread-local: outside [[collect]], `note` is one
  * ThreadLocal read and the by-name reason is never evaluated. The
  * serving entry points (the acceleration rule and QueryService.run)
  * opt IN deliberately so fallbacks can report why — the cost there is
  * a handful of short strings per routing pass, metadata-scale next to
  * any query's execution; direct sqlVia/routeFrame callers stay
  * trace-free. */
object RouteTrace {

  /** one decision: `stage` is where in the pipeline (shape / bind /
    * recognize / filter / router / rewrite / present / serve),
    * `subject` the cube or plan element it concerns. */
  final case class Entry(stage: String, subject: String, reason: String) {
    override def toString: String = s"[$stage] $subject: $reason"
  }

  private val tl = new ThreadLocal[mutable.Buffer[Entry]]() // null = off

  /** record a decision — no-op unless this thread is inside [[collect]] */
  private[graft] def note(stage: String, subject: String,
                         reason: => String): Unit = {
    val buf = tl.get()
    if (buf ne null) { buf += Entry(stage, subject, reason); () }
  }

  /** run `f` with tracing enabled on this thread; returns the result
    * plus everything noted during it (nested collects stack) */
  private[graft] def collect[T](f: => T): (T, Seq[Entry]) = {
    val prev = tl.get()
    val buf = mutable.Buffer.empty[Entry]
    tl.set(buf)
    try {
      val r = f
      (r, buf.toList)
    } finally {
      if (prev eq null) tl.remove() else tl.set(prev)
    }
  }
}
