package graft.cube

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions.col

/** Transparent SQL → cuboid routing: the reference's defining feature
  * (kylin-spark-query SparderContext + runtime/plans/TableScanPlan —
  * Calcite matches a SQL aggregate against the cube and swaps in a
  * cuboid scan). graft's version pattern-matches Spark's ANALYZED plan
  * for `Aggregate [dims ⊆ cube dims] [supported measures]` over the
  * registered star view (optionally through a dim-only Filter) and
  * answers it from the routed cuboid; anything else falls back to the
  * original Spark plan — exactly Kylin's query-pushdown behavior, with
  * Catalyst standing in for Calcite.
  */
object GraftSql {

  val ViewName = "graft_star"

  /** measure recognition: SQL aggregate shape → cube measure name */
  private def measureOf(e: AggregateExpression): Option[String] = e match {
    case AggregateExpression(Sum(a: AttributeReference, _), _, false, _, _)
        if a.name == "disc_price" => Some("revenue")
    case AggregateExpression(Sum(a: AttributeReference, _), _, false, _, _)
        if a.name == "l_quantity" => Some("qty")
    case AggregateExpression(Count(Seq(Literal(1, _))), _, false, _, _) =>
      Some("nrows")
    case AggregateExpression(Count(Seq(a: AttributeReference)), _, true, _, _)
        if a.name == "o_custkey" => Some("cust_bitmap")
    case _ => None
  }

  /** register the star view this router matches (the user-facing model
    * table, like a Kylin project's fact view) */
  def registerView(spark: SparkSession, sfDir: String): Unit =
    CubeManager.flatTable(spark, sfDir).createOrReplaceTempView(ViewName)

  /** Run `query`; if its analyzed plan is a cube-answerable aggregate
    * over the star view, answer from the cube (routed = true), else
    * return Spark's own result (routed = false). */
  def sql(spark: SparkSession, sfDir: String, query: String)
    : (DataFrame, Boolean) = {
    registerView(spark, sfDir)
    val df = spark.sql(query)
    val inst = CubeManager.ensureBuilt(spark, sfDir)
    val dims = inst.cube.dims.toSet

    def overView(plan: LogicalPlan): Boolean = plan match {
      case SubqueryAlias(id, _) => id.name == ViewName
      case _ => false
    }

    // peel ORDER BY / LIMIT above the aggregate into DataFrame
    // post-ops applied to the routed result (attribute sorts only)
    def peel(plan: LogicalPlan): Option[(LogicalPlan, DataFrame => DataFrame)] =
      plan match {
        case a: Aggregate => Some((a, identity))
        case Sort(order, true, inner, _) =>
          val cols = order.map {
            case SortOrder(a: AttributeReference, Ascending, NullsFirst, _) =>
              Some(col(a.name).asc_nulls_first)
            case SortOrder(a: AttributeReference, Ascending, NullsLast, _) =>
              Some(col(a.name).asc_nulls_last)
            case SortOrder(a: AttributeReference, Descending, NullsFirst, _) =>
              Some(col(a.name).desc_nulls_first)
            case SortOrder(a: AttributeReference, Descending, NullsLast, _) =>
              Some(col(a.name).desc_nulls_last)
            case _ => None
          }
          if (cols.forall(_.isDefined))
            peel(inner).map { case (agg, post) =>
              (agg, (d: DataFrame) => post(d).orderBy(cols.flatten: _*))
            }
          else None
        case GlobalLimit(Literal(n: Int, _), LocalLimit(_, inner)) =>
          peel(inner).map { case (agg, post) =>
            (agg, (d: DataFrame) => post(d).limit(n))
          }
        case _ => None
      }

    peel(df.queryExecution.analyzed) match {
      case Some((Aggregate(groups, aggs, child, _), post)) =>
        // child must be the view, optionally through a dim-only filter
        val (filterSql, filterDims, ok) = child match {
          case c if overView(c) => (None, Set.empty[String], true)
          case Filter(cond, c) if overView(c) &&
              cond.references.forall(r => dims(r.name)) =>
            // strip view qualifiers so the predicate resolves against
            // the cuboid frame on the expr() round-trip
            val bare = cond.transform {
              case a: AttributeReference => a.withQualifier(Seq.empty)
            }
            (Some(bare.sql), cond.references.map(_.name).toSet, true)
          case _ => (None, Set.empty[String], false)
        }
        val groupNames = groups.collect { case a: AttributeReference => a.name }
        val measures = aggs.collect {
          case Alias(ae: AggregateExpression, name) => measureOf(ae).map(_ -> name)
        }
        val groupsOk = groups.length == groupNames.length &&
          groupNames.toSet.subsetOf(dims)
        // every output is either a grouped dim or a recognized measure
        val outputOk = aggs.forall {
          case _: AttributeReference => true
          case Alias(_: AggregateExpression, _) => true
          case _ => false
        }
        if (ok && groupsOk && outputOk && measures.forall(_.isDefined)
            && measures.nonEmpty) {
          val q = CubeQuery(groupNames, measures.flatten,
            filter = filterSql.map(org.apache.spark.sql.functions.expr),
            filterDims = filterDims)
          val routed = QueryRouter.route(spark, inst, q)(df)
          if (routed.fallback) (df, false)
          else {
            // restore the query's own output column order, then apply
            // the peeled ORDER BY / LIMIT
            val outNames = aggs.map {
              case a: AttributeReference => a.name
              case Alias(_, name) => name
            }
            (post(routed.df.select(outNames.map(col): _*)), true)
          }
        } else (df, false)
      case _ => (df, false)
    }
  }
}
