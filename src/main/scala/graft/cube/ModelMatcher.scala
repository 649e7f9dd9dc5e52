package graft.cube

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._

/** One PK-FK join edge of a star model: `lookup` (whose `lookupKey` is
  * its primary key) joins to the model through `via` — the table that
  * carries the foreign key. Inner-joining along a declared edge is
  * row-preserving on the fact side (every FK matches exactly one PK
  * row), which is what makes answering a user-written join from the
  * pre-joined flat table sound — the same PK-FK contract Kylin's data
  * model declares. */
final case class ModelEdge(lookup: String, via: String,
                           lookupKey: String, foreignKey: String)

/** A star model: fact table + lookup edges (reference: core-metadata
  * DataModelDesc — fact/lookups/join conditions). */
final case class ModelDef(fact: String, edges: Seq[ModelEdge]) {
  require(edges.map(_.lookup).distinct.size == edges.size,
    "one edge per lookup table")
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
  * A plan matches iff it is a pure inner-join tree over base relations
  * where: the fact table is present; every other table is a model
  * lookup whose FK carrier is also present (connectivity — a lookup
  * can't join in through a missing intermediate); and the ON conjuncts
  * are EXACTLY the declared PK-FK equi-edges of the used tables, one
  * each. Extra predicates in ON clauses, non-model tables, outer
  * joins, or wrong keys all fail the match → clean fallback.
  */
object ModelMatcher {

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

  /** (tables, equi-join conjunct name pairs) of a pure inner-join tree
    * over aliased base relations; None if any other node appears */
  private def walk(p: LogicalPlan): Option[(Set[String], Seq[(String, String)])] =
    p match {
      case SubqueryAlias(id, child) if isBaseRelation(child) =>
        Some((Set(id.name.toLowerCase), Nil))
      case Join(l, r, Inner, Some(cond), _) =>
        for {
          (lt, lc) <- walk(l)
          (rt, rc) <- walk(r)
          pairs <- eqPairs(cond)
        } yield (lt ++ rt, lc ++ rc ++ pairs)
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
    * its tables */
  def matches(plan: LogicalPlan, model: ModelDef): Boolean =
    walk(plan).exists { case (tables, conds) =>
      val used = model.edges.filter(e => tables.contains(e.lookup))
      val condSets = conds.map { case (a, b) => Set(a, b) }
      tables.contains(model.fact) &&
        tables == used.map(_.lookup).toSet + model.fact &&
        used.forall(e => tables.contains(e.via)) &&
        conds.size == used.size &&
        condSets.distinct.size == condSets.size &&
        condSets.toSet == used.map(e => Set(e.lookupKey, e.foreignKey)).toSet
    }
}
