package graft.cube

import org.apache.spark.sql.Column

/** One cube measure, defined by its three lifecycle expressions
  * (mirrors the reference's measure dispatch in kylin-spark-engine
  * CuboidAggregator.scala:79-110):
  *
  *  - `fromRaw`   : aggregate over the flat table → mergeable state
  *                  (base-cuboid build)
  *  - `fromState` : aggregate over a parent cuboid's state column →
  *                  state (layered child build, segment merge, and
  *                  query-time post-aggregation — all the same op)
  *  - `present`  : state → user-facing value (query side only)
  */
final case class Measure(
    name: String,
    fromRaw: Column,
    fromState: String => Column,
    present: Column => Column = identity,
    answers: Option[SqlAgg] = None,
    topnShape: Option[TopNShape] = None,
    /** the raw expression this measure SUMs, when it is a sum over a
      * composite expression: lets the SQL front-end match a user-
      * written `SUM(<expr>)` by canonicalized tree equality (reference:
      * FunctionDesc parameter matching) in addition to the plain-column
      * `answers` shape */
    answersSumOf: Option[Column] = None,
    /** per-cell state is orders of magnitude heavier than a scalar
      * (dense HLL register arrays) — a cost the router's estRows proxy
      * cannot see. The lightweight-scan fast path skips single-partition
      * coalescing when a requested measure carries this flag: the r22
      * min-of-6 A/B measured serializing the HLL merge at +15–40% on
      * cube_hll_distinct while every scalar/bitmap/topn/kll key was
      * flat-to-−34%. */
    heavyState: Boolean = false) {
  /** state column name in cuboid parquet */
  def stateCol: String = s"m_$name"
}

/** The raw-SQL aggregate shape a measure answers — what lets the SQL
  * front-end (GraftSql) recognize a user-written aggregate call and
  * swap in this measure's cuboid state, for ANY cube (the reference
  * drives the same rewrite from measure metadata:
  * core-metadata/.../measure/MeasureTypeFactory + query/.../
  * RealizationChooser — not from hardcoded column names). */
sealed trait SqlAgg
object SqlAgg {
  /** answers `SUM(column)` */
  final case class SumOf(column: String) extends SqlAgg
  /** answers `COUNT(*)` */
  case object CountAll extends SqlAgg
  /** answers `COUNT(DISTINCT column)` — and, when the measure is a
    * bitmap, `intersect_count(column, dim, vals)` retention calls */
  final case class CountDistinctOf(column: String) extends SqlAgg
  /** answers `MIN(column)` (reference basic measure family — min/max
    * states merge losslessly through any re-aggregation) */
  final case class MinOf(column: String) extends SqlAgg
  /** answers `MAX(column)` */
  final case class MaxOf(column: String) extends SqlAgg
  /** answers `approx_count_distinct(column)` from an HLL-sketch state
    * (reference: measure/hllc/HLLCMeasureType.java:40-47 rewrites
    * approximate count-distinct onto the hllc measure). The requested
    * relative-error argument is ignored — the sketch was sized at build
    * time, exactly as in the reference. */
  final case class ApproxDistinctOf(column: String) extends SqlAgg
  /** answers `percentile_approx(column, p)` for ANY scalar p from a
    * quantile-sketch state (reference: measure/percentile/
    * PercentileMeasureType.java:83-95 rewrites percentile_approx onto
    * the percentile measure) — the state is percentile-agnostic, so
    * the rewrite evaluates it at the query's own p. */
  final case class PercentileOf(column: String) extends SqlAgg
}

/** Declares a TopN measure's sketch shape so the SQL front-end can
  * rewrite `GROUP BY dims ORDER BY SUM(sumOf) DESC LIMIT n` into a
  * sketch extraction (Kylin's topn rewrite, TopNMeasureType.java:129).
  * `dims` are the sketch's literal (grouped) columns — one or many;
  * `sumOf` is the source column of the sketch's sort value, stored
  * scaled by `scale` (exact integer sums through merges). */
final case class TopNShape(dims: Seq[String], sumOf: String, scale: Long)

/** A derived dimension: a lookup-table attribute NOT materialized in
  * any cuboid, answered by joining the lookup snapshot on a host dim
  * that IS materialized (reference: CubeDesc.java:219 derivedToHostMap
  * — Kylin answers group-by on such attributes from the cuboid + the
  * dimension snapshot instead of falling back to the source). `name`
  * must be unique in the lookup and functionally determined by
  * `host` (host is the lookup's key column as materialized in the
  * flat table). */
final case class DerivedDim(name: String, host: String, lookup: String)

/** An extended column (reference: measure/extendedcolumn/
  * ExtendedColumnMeasureType.java): a flat-table column functionally
  * determined by a host dim, carried as a MEASURE (its single value
  * per host) instead of a cuboid dim — queries grouping by host may
  * select/group the extended column and the router answers it from
  * `measure`, keeping cuboid cardinality at the host's grain. */
final case class ExtendedColumn(name: String, host: String, measure: String)

/** A time segment: rows with segmentCol in [start, end). Segments are
  * the unit of incremental build, merge, and pruning (reference:
  * FilePruner.scala:153-221 pruneSegments). */
final case class Segment(name: String, start: String, end: String)

/** A time-derived dimension stored in cuboids (e.g. o_month = yyyy-MM of
  * the segment column). When a query's time range only partially covers
  * a segment, the router applies a residual row-level filter on this dim
  * — Kylin likewise applies the time filter in addition to segment
  * pruning. `toDimValue` maps a range boundary date (yyyy-MM-dd) to the
  * dim's value iff the boundary is aligned with the dim's granularity
  * (None → not expressible → the router falls back to the source). */
final case class TimeDim(name: String, toDimValue: String => Option[String])

object TimeDim {
  /** month-granularity dim over a yyyy-MM-dd boundary; dim values are
    * "yyyy-MM" strings, which order lexicographically = chronologically */
  def month(name: String): TimeDim =
    TimeDim(name, d => if (d.length == 10 && d.endsWith("-01")) Some(d.substring(0, 7)) else None)
}

/** Declarative aggregation group (reference: core-cube
  * AggregationGroup.java:47-75, expanded by CuboidScheduler): instead
  * of hand-listing cuboids, declare dimension RELATIONSHIPS and expand
  * the rule-pruned lattice:
  *
  *  - `includes`: the dims this group spans (all subsets start here)
  *  - `mandatory`: present in every cuboid of the group — queries
  *    always group/filter by them, so the lattice shrinks by
  *    2^|mandatory|
  *  - `hierarchies`: ordered coarse→fine lists (region→nation,
  *    year→month); only PREFIXES materialize — nation without region
  *    is never built, a nation-only query re-aggs from the prefix
  *    cuboid that carries both
  *  - `joints`: all-or-none sets (dims always queried together)
  *
  * Every dim may be governed by at most one rule; remaining includes
  * are free (in/out). `expand` is the cartesian product of the rule
  * choices — exactly the reference's scheduler semantics. */
final case class AggGroup(includes: Seq[String],
    mandatory: Set[String] = Set.empty,
    hierarchies: Seq[Seq[String]] = Nil,
    joints: Seq[Set[String]] = Nil) {
  private val inc = includes.toSet
  require(includes.distinct.size == includes.size, "duplicate include")
  require(mandatory.subsetOf(inc), "mandatory dims must be included")
  require(hierarchies.forall(_.forall(inc)), "hierarchy dims must be included")
  require(joints.forall(_.forall(inc)), "joint dims must be included")
  private val ruled = hierarchies.flatten ++ joints.flatten
  require(ruled.distinct.size == ruled.size,
    "a dim may be governed by at most one hierarchy/joint rule")
  require(!ruled.exists(mandatory), "mandatory dims can't also be ruled")

  /** the cuboids this group materializes */
  def expand: Seq[Set[String]] = {
    val free = includes.filterNot(d => mandatory(d) || ruled.contains(d))
    val unitChoices: Seq[Seq[Set[String]]] =
      hierarchies.map(h => (0 to h.size).map(i => h.take(i).toSet)) ++
        joints.map(j => Seq(Set.empty[String], j)) ++
        free.map(d => Seq(Set.empty[String], Set(d)))
    unitChoices.foldLeft(Seq(mandatory)) { (acc, choices) =>
      for { a <- acc; c <- choices } yield a ++ c
    }.distinct
  }
}

object AggGroup {
  /** the materialized set for a cube: group expansions ∪ the base
    * cuboid (always required — it rebuilds everything else) */
  def cuboids(dims: Seq[String], groups: Seq[AggGroup]): Seq[Set[String]] =
    (groups.flatMap(_.expand).filter(_.nonEmpty) :+ dims.toSet).distinct
}

/** Cube definition: star-model dims + measures + materialized cuboid
  * lattice subset (reference: core-metadata cube desc + agg groups).
  *
  * A cuboid is identified by the subset of `dims` it retains; its id is
  * the bitmask over `dims` order (bit i ⇔ dims(i) present) — same
  * scheme as the reference's cuboid ids (core-cube CuboidUtil).
  */
final case class CubeDef(
    name: String,
    dims: Seq[String],
    measures: Seq[Measure],
    segmentCol: String,
    segments: Seq[Segment],
    cuboids: Seq[Set[String]],
    timeDim: Option[TimeDim] = None,
    shardBy: Option[String] = None,
    derived: Seq[DerivedDim] = Nil,
    /** flat-table columns the cube author guarantees non-null (a NOT
      * NULL contract, like DDL): gates rewrites whose algebra assumes
      * no nulls — e.g. AVG(x) → SUM(x)/COUNT(*) is only exact when x
      * never misses a row */
    notNull: Set[String] = Set.empty,
    extended: Seq[ExtendedColumn] = Nil,
    /** the reference's partition-column contract (partition_date_column
      * with a yyyy-MM-dd format, core-metadata PartitionDesc): every
      * segmentCol value sits exactly on a day boundary. Lets the SQL
      * front-end convert closed/equality day predicates (<=, =, >,
      * BETWEEN) into exact [day, day) ranges — `col <= d` ⇔
      * `col < d+1day` only when no value can fall strictly between the
      * two instants. A true-timestamp segment column (mid-day values)
      * must leave this false. */
    segDayGranular: Boolean = false,
    /** flat-table string columns dictionary-encoded before the build
      * (each contributes `<col>_id` — [[Dictionary]]'s append-stable
      * PER-ROOT tree, reference AppendTrieDictionary.java:66). Ids are
      * assigned by the owning root's append order, so a bitmap state
      * over `<col>_id` is meaningful only within its own root's id
      * space — it must never merge with states from another cube's
      * root. [[CubeJson]] refuses hybrid members that declare these at
      * deploy time, and [[HybridRouter]] falls back rather than splice
      * them at query time. */
    dictColumns: Set[String] = Set.empty,
    /** true when this cube's dictionary ids are GUARANTEED to come
      * from its root's shared dict tree — the declared `rootScope`
      * build path (CubeManager.dictEncode against the scoped root).
      * [[HybridRouter]]'s splice guard treats same-root members' dict
      * states as one id space only under this flag: merely sharing a
      * directory proves nothing about where a code-constructed cube's
      * ids came from. */
    sharedDictRoot: Boolean = false) {

  require(cuboids.exists(_ == dims.toSet),
    "materialized set must include the base cuboid (all dims)")
  require(cuboids.forall(_.subsetOf(dims.toSet)),
    "cuboid dims must be cube dims")

  def cuboidId(c: Set[String]): Long =
    dims.zipWithIndex.collect { case (d, i) if c(d) => 1L << i }.sum

  /** dims of a cuboid in canonical (cube dim order) sequence */
  def cuboidDims(c: Set[String]): Seq[String] = dims.filter(c)

  def measure(n: String): Measure =
    measures.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no measure $n"))

  /** the measure answering a given SQL aggregate shape, if any */
  def measureAnswering(shape: SqlAgg): Option[Measure] =
    measures.find(_.answers.contains(shape))

  /** the measure answering `SUM(<expr>)` for a composite expression,
    * by canonicalized-tree equality with the measure's declared
    * defining expression (FunctionDesc parameter matching) */
  def measureAnsweringSumExpr(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
    : Option[Measure] =
    measures.find(_.answersSumOf.exists(c => ExprCanon.same(
      org.apache.spark.sql.graftbridge.ColumnBridge.expressionTree(c), e)))

  /** Names of measures whose defining aggregate reads a dictionary id
    * column (`<dictCol>_id`) — their states are root-local (see
    * `dictColumns`) and must never merge across cube roots. An
    * uninspectable defining expression counts as dict-encoded when the
    * cube declares dictColumns at all: the only cost of over-claiming
    * is a query falling back to the always-consistent source. */
  def dictEncodedMeasures: Set[String] =
    if (dictColumns.isEmpty) Set.empty
    else {
      val idCols: Set[String] = dictColumns.map(c => s"${c}_id")
      measures.filter { m =>
        scala.util.Try(
          org.apache.spark.sql.graftbridge.ColumnBridge
            .expressionTree(m.fromRaw).collect {
              // both attribute kinds: col("x_id") stays unresolved,
              // df("x_id") arrives as a resolved AttributeReference —
              // missing the latter would let a code-constructed member
              // slip past the hybrid splice guard
              case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
                  if idCols.contains(u.nameParts.last) => u
              case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
                  if idCols.contains(a.name) => a
            }.nonEmpty).getOrElse(true)
      }.map(_.name).toSet
    }

  def derivedDim(n: String): Option[DerivedDim] = derived.find(_.name == n)

  def extendedCol(n: String): Option[ExtendedColumn] =
    extended.find(_.name == n)

  /** a group-by name is routable if it's a materialized dim, a
    * declared derived dim, or an extended column (whose host must
    * also be grouped — the router enforces that) */
  def routableDim(n: String): Boolean =
    dims.contains(n) || derivedDim(n).isDefined || extendedCol(n).isDefined
}
