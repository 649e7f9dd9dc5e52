package graft.cube

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions.col

/** One PK-FK join edge of a star model: `lookup` (whose `lookupKey` is
  * its primary key) joins to the model through `via` — the table that
  * carries the foreign key. `joinType` is "inner" or "left" (reference:
  * core-metadata JoinDesc.java:35-40 — each model join declares its
  * type; production models mostly declare LEFT so fact rows without a
  * dim match aren't dropped). An inner edge is row-preserving on the
  * fact side only under the PK-FK completeness contract; a left edge is
  * row-preserving unconditionally (unmatched fact rows keep null dims). */
final case class ModelEdge(lookup: String, via: String,
                           lookupKey: String, foreignKey: String,
                           joinType: String = "inner") {
  require(joinType == "inner" || joinType == "left",
    s"joinType must be inner or left, got $joinType")
}

/** A star model: fact table + lookup edges + an optional model-level
  * filter (reference: core-metadata DataModelDesc —
  * fact/lookups/join conditions/filterCondition). The filter scopes
  * the model's data universe (e.g. `status <> 'CANCELLED'`): it
  * applies once in `flatten`, so the built cube, the registered view,
  * and the pushdown fallback all see the same filtered rows. */
final case class ModelDef(fact: String, edges: Seq[ModelEdge],
                          filter: Option[org.apache.spark.sql.Column] = None) {
  require(edges.map(_.lookup).distinct.size == edges.size,
    "one edge per lookup table")

  /** Materialize the model's flat join over the given tables, honoring
    * each edge's DECLARED join type — the single place the type is
    * interpreted, so the built flat table and the query matcher can
    * never disagree (reference: CreateFlatTable joins lookups with the
    * model's JoinDesc type, then applies the model filter). Edges must
    * be declared in an order where each `via` is the fact or an
    * earlier lookup. Callers pass broadcast-hinted frames where a
    * lookup should broadcast. */
  def flatten(tables: String => DataFrame): DataFrame = {
    val joined = edges.foldLeft(tables(fact)) { (acc, e) =>
      val how = if (e.joinType == "left") "left" else "inner"
      acc.join(tables(e.lookup),
        col(e.foreignKey) === col(e.lookupKey), how)
    }
    filter.fold(joined)(joined.filter)
  }
}

/** Matches a user-written explicit join tree against a declared star
  * model, so `lineitem JOIN orders ON ... GROUP BY ...` routes to the
  * cube exactly like a query against the pre-joined view (reference:
  * query/src/main/java/org/apache/kylin/query/optrule/OLAPJoinRule.java:37
  * recognizes model joins in the Calcite plan;
  * kylin-spark-query/.../runtime/plans/TableScanPlan.scala:51-66 swaps
  * the cuboid scan in). Catalyst's analyzed `Join` tree stands in for
  * the Calcite rel tree.
  *
  * A plan matches iff it is a join tree over base relations where: the
  * fact table is present; every other table is a model lookup whose FK
  * carrier is also present (connectivity — a lookup can't join in
  * through a missing intermediate); the ON conjuncts are EXACTLY the
  * declared PK-FK equi-edges of the used tables, one each; and each
  * join's TYPE equals the edge's declared type (JoinDesc.java:35-40 —
  * an inner-written join over a left-declared edge, or vice versa,
  * differs in row preservation and must fall back). A LEFT join only
  * matches with the lookup alone on the null-producing right side —
  * anything else preserves the wrong rows. Extra ON predicates,
  * non-model tables, other join types, or wrong keys all fail the
  * match → clean fallback.
  */
object ModelMatcher {

  /** one ON conjunct: its key pair, whether its join was LEFT, and the
    * tables of that join's right subtree */
  private final case class Cond(keys: Set[String], leftJoin: Boolean,
                                rightTables: Set[String])

  /** An alias counts as a model table only when it stands directly over
    * a base relation (possibly through further alias/view wrappers). A
    * derived table that merely REUSES a model table's name — e.g.
    * `FROM (SELECT * FROM lineitem WHERE ...) lineitem` — must NOT
    * match: routing it to the cube would silently drop the inner
    * predicate/projection. Kylin's OLAPJoinRule likewise only fires on
    * actual table scans. */
  private def isBaseRelation(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case SubqueryAlias(_, c) => isBaseRelation(c)
    case v: View => isBaseRelation(v.child)
    case _ => false
  }

  /** (tables, tagged ON conjuncts) of an inner/left join tree over
    * aliased base relations; None if any other node appears. A LEFT
    * node must attach exactly one table through exactly one conjunct —
    * the shape whose preserved side is everything joined so far. */
  /** A relation name is trusted as a model table only when it is
    * unqualified (our registerViews owns those temp-view names) or
    * qualified into graft's own catalog database IN THE SESSION
    * CATALOG — the FULL qualifier is pinned, not just its last part,
    * so a foreign catalog's database that happens to be named
    * graft_cat (`lake.graft_cat.lineitem`) can never route its
    * different data to the cube. */
  private[graft] def trustedQualifier(q: Seq[String]): Boolean =
    q.isEmpty ||
      (q.last.equalsIgnoreCase(GraftCatalog.Db) &&
        (q.length == 1 ||
          (q.length == 2 && q.head.equalsIgnoreCase("spark_catalog"))))

  /** the qualifier names graft's own catalog db (non-empty + trusted) —
    * the acceleration pre-filter's cheap gate */
  private[graft] def catalogQualified(q: Seq[String]): Boolean =
    q.nonEmpty && trustedQualifier(q)

  private def walk(p: LogicalPlan): Option[(Set[String], Seq[Cond])] =
    p match {
      case SubqueryAlias(id, child)
          if isBaseRelation(child) && trustedQualifier(id.qualifier) =>
        Some((Set(id.name.toLowerCase), Nil))
      case Join(l, r, jt, Some(cond), _) if jt == Inner || jt == LeftOuter =>
        for {
          (lt, lc) <- walk(l)
          (rt, rc) <- walk(r)
          pairs <- eqPairs(cond)
          if jt == Inner ||
            (rt.size == 1 && rc.isEmpty && pairs.size == 1)
        } yield (lt ++ rt,
          lc ++ rc ++ pairs.map(pr => Cond(Set(pr._1, pr._2),
            jt == LeftOuter, rt)))
      case _ => None
    }

  /** conjunction of attribute-to-attribute equalities, or None */
  private def eqPairs(cond: Expression): Option[Seq[(String, String)]] =
    cond match {
      case And(a, b) =>
        for { x <- eqPairs(a); y <- eqPairs(b) } yield x ++ y
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        Some(Seq((a.name, b.name)))
      case _ => None
    }

  /** true iff `plan` is exactly the model's star join over a subset of
    * its tables, with every join typed as its edge declares. A model
    * with a filterCondition never matches explicit-join SQL: the raw
    * tables contain rows the cube excludes, so routing would silently
    * apply the model filter to a query that didn't ask for it — only
    * the registered view (which carries the filter) routes. */
  def matches(plan: LogicalPlan, model: ModelDef): Boolean =
    model.filter.isEmpty && walk(plan).exists { case (tables, conds) =>
      val used = model.edges.filter(e => tables.contains(e.lookup))
      val condSets = conds.map(_.keys)
      tables.contains(model.fact) &&
        tables == used.map(_.lookup).toSet + model.fact &&
        used.forall(e => tables.contains(e.via)) &&
        conds.size == used.size &&
        condSets.distinct.size == condSets.size &&
        used.forall { e =>
          conds.exists(c => c.keys == Set(e.lookupKey, e.foreignKey) &&
            (if (e.joinType == "left")
               c.leftJoin && c.rightTables == Set(e.lookup)
             else !c.leftJoin))
        } &&
        condSets.toSet == used.map(e => Set(e.lookupKey, e.foreignKey)).toSet
    }
}
