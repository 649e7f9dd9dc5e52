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
  */
object QueryRouter {

  def route(spark: SparkSession, inst: CubeInstance, q: CubeQuery)
           (fallback: => DataFrame): Routed = {
    val cube = inst.cube
    val needed = q.groupBy.toSet ++ q.filterDims
    val candidates = cube.cuboids.filter(needed.subsetOf(_))
    if (candidates.isEmpty)
      return Routed(fallback, None, Nil, fallback = true)

    val chosen = candidates.minBy(c => (inst.totalRows(c), c.size))
    val id = cube.cuboidId(chosen)
    val segs = cube.segments.filter { s =>
      q.timeRange.forall { case (qs, qe) => s.start < qe && qs < s.end }
    }
    val paths = segs.map(s => inst.cuboidPath(s.name, id))
    var df = spark.read.parquet(paths: _*)
    q.filter.foreach(f => df = df.filter(f))
    val aggs = q.measures.map { case (m, _) =>
      cube.measure(m).fromState(cube.measure(m).stateCol)
        .as(cube.measure(m).stateCol)
    }
    val grouped = df.groupBy(q.groupBy.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val out = grouped.select(
      q.groupBy.map(col) ++ q.measures.map { case (m, alias) =>
        cube.measure(m).present(col(cube.measure(m).stateCol)).as(alias)
      }: _*)
    Routed(out, Some(chosen), segs.map(_.name), fallback = false)
  }
}
