package graft.cube

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A routable aggregate query against a cube: group-by dims, an
  * optional dim-only filter, an optional time range for segment
  * pruning, and requested measures (name → output alias). */
final case class CubeQuery(
    groupBy: Seq[String],
    measures: Seq[(String, String)],
    filter: Option[Column] = None,
    filterDims: Set[String] = Set.empty,
    timeRange: Option[(String, String)] = None)

/** Result of routing: the answering DataFrame plus which cuboid and
  * segments served it (None/fallback=true when no cuboid covers the
  * query and the source star join answered instead — the reference's
  * query-pushdown, kylin-spark-query/.../pushdown/). */
final case class Routed(
    df: DataFrame,
    cuboid: Option[Set[String]],
    segments: Seq[String],
    fallback: Boolean)

/** Smallest-covering-cuboid routing (reference:
  * CuboidLayoutChooser.scala:25 selectLayoutForBuild, query side
  * TableScanPlan.scala): a cuboid can answer the query iff its dim set
  * ⊇ (groupBy ∪ filter dims); among candidates pick the fewest-rows
  * one, prune segments by time-range overlap, then re-aggregate states
  * and present. Exact-match and partial-match are the same plan — a
  * groupBy over the cuboid — because states must be merged across
  * segments/files either way.
  *
  * Time semantics (Kylin applies the time filter IN ADDITION to segment
  * pruning): segments fully inside the range are read as-is; partially
  * overlapping segments require a residual row-level filter on the
  * cube's time-derived dim (`CubeDef.timeDim`). If the range is not
  * expressible on that dim (boundary not aligned to its granularity, or
  * the dim isn't materialized in any covering cuboid) the router falls
  * back to the source rather than silently over-returning rows.
  */
object QueryRouter {

  def route(spark: SparkSession, inst: CubeInstance, q: CubeQuery)
           (fallback: => DataFrame): Routed =
    routeImpl(spark, inst, q, present = true)(fallback)

  /** like route, but measures come back as their mergeable STATES
    * (aliased, no finalizer) — for composite post-processing such as
    * bitmap intersections (Kylin intersect_count) */
  def routeStates(spark: SparkSession, inst: CubeInstance, q: CubeQuery)
                 (fallback: => DataFrame): Routed =
    routeImpl(spark, inst, q, present = false)(fallback)

  private def routeImpl(spark: SparkSession, inst: CubeInstance,
                        q: CubeQuery, present: Boolean)
                       (fallback: => DataFrame): Routed = {
    val cube = inst.cube

    // a cube with no segments has nothing to scan (ADVICE r3: the
    // zero-path reduce below would throw) — clean fallback instead
    if (cube.segments.isEmpty)
      return Routed(fallback, None, Nil, fallback = true)

    // ── derived dims (reference: CubeDesc.java:219 derivedToHostMap):
    // a group-by on a lookup attribute not materialized in any cuboid
    // is answered by joining the lookup SNAPSHOT on its host dim —
    // never by falling back to the source. Unknown names → fallback.
    if (!q.groupBy.forall(cube.routableDim))
      return Routed(fallback, None, Nil, fallback = true)
    val derivedUsed = q.groupBy.flatMap(cube.derivedDim).distinct

    // ── extended columns (ExtendedColumnMeasureType): functionally
    // determined by a grouped host dim, answered from their measure —
    // the host MUST be grouped too (Kylin's contract); the extended
    // name is stripped from the cuboid group-by and re-attached from
    // the measure value after aggregation
    val extUsed = q.groupBy.flatMap(cube.extendedCol).distinct
    if (extUsed.exists(e => !q.groupBy.contains(e.host)))
      return Routed(fallback, None, Nil, fallback = true)
    val realGroup = q.groupBy.filterNot(n => extUsed.exists(_.name == n))

    // ── segment pruning + residual-filter requirement
    val overlapping = cube.segments.filter { s =>
      q.timeRange.forall { case (qs, qe) => s.start < qe && qs < s.end }
    }
    val partial = q.timeRange match {
      case Some((qs, qe)) => overlapping.filterNot(s => qs <= s.start && s.end <= qe)
      case None => Nil
    }
    // residual filter on the time-derived dim, when needed + expressible
    val residual: Option[(String, Column)] =
      if (partial.isEmpty) None
      else (cube.timeDim, q.timeRange) match {
        case (Some(td), Some((qs, qe))) =>
          (td.toDimValue(qs), td.toDimValue(qe)) match {
            case (Some(lo), Some(hi)) =>
              Some(td.name -> (col(td.name) >= lit(lo) && col(td.name) < lit(hi)))
            case _ => return Routed(fallback, None, Nil, fallback = true)
          }
        case _ => return Routed(fallback, None, Nil, fallback = true)
      }

    // ── derived dims in the FILTER route the same way (reference:
    // cube/kv/RowKeyDecoder + DerivedFilterTranslator — Kylin answers
    // lookup-attribute predicates through the snapshot on the host):
    // the cuboid only needs the HOSTS; the lookup attaches before the
    // predicate applies. Unknown filter names → clean fallback.
    if (!q.filterDims.forall(n =>
        cube.dims.contains(n) || cube.derivedDim(n).isDefined))
      return Routed(fallback, None, Nil, fallback = true)
    val filterDerived = q.filterDims.toSeq.flatMap(cube.derivedDim).distinct

    // ── cuboid choice: must cover groupBy (derived dims replaced by
    // their hosts, extended columns dropped — their hosts are already
    // grouped) ∪ filter dims (derived → hosts) ∪ residual dim
    val needed = realGroup.filter(cube.dims.contains).toSet ++
      derivedUsed.map(_.host) ++ q.filterDims.filter(cube.dims.contains) ++
      filterDerived.map(_.host) ++ residual.map(_._1)
    val candidates = cube.cuboids.filter(needed.subsetOf(_))
    if (candidates.isEmpty)
      return Routed(fallback, None, Nil, fallback = true)
    val chosen = candidates.minBy(c => (inst.totalRows(c), c.size))
    val id = cube.cuboidId(chosen)

    // ── scan: empty overlap short-circuits to an empty result with the
    // right schema (read the cuboid, keep no rows) instead of a
    // zero-path read, which throws.
    val (paths, emptyScan) =
      if (overlapping.nonEmpty) (overlapping.map(s => inst.cuboidPath(s.name, id)), false)
      else (cube.segments.map(s => inst.cuboidPath(s.name, id)), true)
    // Shard-partitioned cuboid dirs need one read per segment root
    // (multi-root reads break partition discovery); everything else
    // reads all segment paths in ONE relation — at thousands of
    // segments that is one file listing and one scan node, not a
    // thousand-way union.
    val sharded = cube.shardBy.exists(chosen.contains)
    var df =
      if (sharded) paths.map(spark.read.parquet(_)).reduce(_ unionByName _)
      else spark.read.parquet(paths: _*)
    if (emptyScan) df = df.filter(lit(false))
    residual.foreach { case (_, pred) => df = df.filter(pred) }

    // ── attach derived dims (grouped AND filtered ones): broadcast-
    // join the lookup snapshot on the host dim (snapshots are written
    // under the cube root at build time; host is the lookup's key, so
    // the join is 1:1). The query filter applies AFTER the attach so
    // lookup-attribute predicates resolve.
    (derivedUsed ++ filterDerived).distinct.foreach { dd =>
      val snap = spark.read
        .parquet(Snapshot.path(inst.root, dd.lookup))
        .select(col(dd.host), col(dd.name))
      df = df.join(broadcast(snap), Seq(dd.host), "left")
    }
    q.filter.foreach(f => df = df.filter(f))

    // ── re-aggregate mergeable states (incl. extended-column value
    // measures), then present: group cols in the REQUESTED order, with
    // extended names served from their measures
    val aggs = (q.measures.map(_._1) ++ extUsed.map(_.measure)).distinct
      .map(m => cube.measure(m).fromState(cube.measure(m).stateCol)
        .as(cube.measure(m).stateCol))
    val grouped = df.groupBy(realGroup.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val groupCols = q.groupBy.map { n =>
      extUsed.find(_.name == n) match {
        case Some(e) =>
          val m = cube.measure(e.measure)
          m.present(col(m.stateCol)).as(n)
        case None => col(n)
      }
    }
    val out = grouped.select(
      groupCols ++ q.measures.map { case (m, alias) =>
        val state = col(cube.measure(m).stateCol)
        (if (present) cube.measure(m).present(state) else state).as(alias)
      }: _*)
    Routed(out, Some(chosen), overlapping.map(_.name), fallback = false)
  }
}
