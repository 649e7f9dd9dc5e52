package graft.cube

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions.{col, expr, lit, posexplode}
import org.apache.spark.sql.types.DoubleType

import graft.functions.Measures

/** Transparent SQL → cuboid routing: the reference's defining feature
  * (kylin-spark-query SparderContext + runtime/plans/TableScanPlan —
  * Calcite matches a SQL aggregate against the cube and swaps in a
  * cuboid scan). graft's version pattern-matches Spark's ANALYZED plan
  * for `Aggregate [dims ⊆ cube dims] [supported measures]` over the
  * registered star view (optionally through a dim-only Filter, with
  * ORDER BY / LIMIT peeled above) and answers it from the routed
  * cuboid; the global top-N shape on the TopN measure's literal dim is
  * answered from the pre-computed TopN SKETCH (Kylin's topn rewrite);
  * anything else falls back to the original Spark plan — exactly
  * Kylin's query-pushdown behavior, with Catalyst standing in for
  * Calcite.
  */
object GraftSql {

  val ViewName = "graft_star"

  /** how a query was answered */
  final case class SqlResult(df: DataFrame, routed: Boolean, via: String)

  /** recognized output shapes: a routed measure, or a derived
    * combination of routed measures (Kylin rewrites avg the same way) */
  private sealed trait MOut { def measures: Seq[String] }
  private final case class MCol(m: String) extends MOut {
    def measures: Seq[String] = Seq(m)
  }
  private case object MAvgQty extends MOut {
    def measures: Seq[String] = Seq("qty", "nrows")
  }

  /** measure recognition: SQL aggregate shape → output spec */
  private def measureOf(e: AggregateExpression): Option[MOut] = e match {
    case AggregateExpression(Sum(a: AttributeReference, _), _, false, _, _)
        if a.name == "disc_price" => Some(MCol("revenue"))
    case AggregateExpression(Sum(a: AttributeReference, _), _, false, _, _)
        if a.name == "l_quantity" => Some(MCol("qty"))
    case AggregateExpression(Count(Seq(Literal(1, _))), _, false, _, _) =>
      Some(MCol("nrows"))
    case AggregateExpression(Count(Seq(a: AttributeReference)), _, true, _, _)
        if a.name == "o_custkey" => Some(MCol("cust_bitmap"))
    // avg = exact decimal sum / count, assembled from two routed
    // measures — the same rewrite Kylin applies to AVG
    case AggregateExpression(Average(a: AttributeReference, _), _, false, _, _)
        if a.name == "l_quantity" => Some(MAvgQty)
    case _ => None
  }

  /** register the star view this router matches (the user-facing model
    * table, like a Kylin project's fact view) */
  def registerView(spark: SparkSession, sfDir: String): Unit =
    CubeManager.flatTable(spark, sfDir).createOrReplaceTempView(ViewName)

  /** peeled ORDER BY (as both structure and columns) + LIMIT above the
    * aggregate; sorts are attribute-only */
  private final case class Peeled(agg: Aggregate,
                                  sorts: Seq[(String, Boolean)], // (name, desc)
                                  sortCols: Seq[Column],
                                  limit: Option[Int],
                                  havingSql: Option[String] = None)

  private def peel(plan: LogicalPlan): Option[Peeled] = plan match {
    case a: Aggregate => Some(Peeled(a, Nil, Nil, None))
    // HAVING: a filter directly above the aggregate, referencing only
    // its output attributes (aliases) — re-applied on the routed frame
    case Filter(cond, a: Aggregate)
        if cond.references.forall(r => a.output.exists(_.name == r.name)) =>
      val bare = cond.transform {
        case at: AttributeReference => at.withQualifier(Seq.empty)
      }
      Some(Peeled(a, Nil, Nil, None, Some(bare.sql)))
    case Sort(order, true, inner, _) =>
      val parsed = order.map {
        case SortOrder(a: AttributeReference, Ascending, NullsFirst, _) =>
          Some((a.name, false, col(a.name).asc_nulls_first))
        case SortOrder(a: AttributeReference, Ascending, NullsLast, _) =>
          Some((a.name, false, col(a.name).asc_nulls_last))
        case SortOrder(a: AttributeReference, Descending, NullsFirst, _) =>
          Some((a.name, true, col(a.name).desc_nulls_first))
        case SortOrder(a: AttributeReference, Descending, NullsLast, _) =>
          Some((a.name, true, col(a.name).desc_nulls_last))
        case _ => None
      }
      if (parsed.forall(_.isDefined))
        peel(inner).map(p => p.copy(
          sorts = parsed.flatten.map(t => (t._1, t._2)) ++ p.sorts,
          sortCols = parsed.flatten.map(_._3) ++ p.sortCols))
      else None
    case GlobalLimit(Literal(n: Int, _), LocalLimit(_, inner)) =>
      peel(inner).map(_.copy(limit = Some(n)))
    case _ => None
  }

  /** Backward-compatible entry: (result, routed?). */
  def sql(spark: SparkSession, sfDir: String, query: String)
    : (DataFrame, Boolean) = {
    val r = sqlVia(spark, sfDir, query)
    (r.df, r.routed)
  }

  /** Run `query`; route to the cube when the analyzed plan matches a
    * supported shape, else fall back to Spark's own result. */
  def sqlVia(spark: SparkSession, sfDir: String, query: String): SqlResult = {
    registerView(spark, sfDir)
    val df = spark.sql(query)
    val inst = CubeManager.ensureBuilt(spark, sfDir)
    val dims = inst.cube.dims.toSet

    def overView(plan: LogicalPlan): Boolean = plan match {
      case SubqueryAlias(id, _) => id.name == ViewName
      case _ => false
    }

    peel(df.queryExecution.analyzed) match {
      case Some(p @ Peeled(Aggregate(groups, aggs, child, _), _, _, _, _)) =>
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
        val specs = aggs.collect {
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
        if (!(ok && groupsOk && outputOk && specs.forall(_.isDefined)
            && specs.nonEmpty))
          return SqlResult(df, routed = false, "fallback")
        val outs = specs.flatten

        // ── TopN-measure rewrite: global `GROUP BY p_brand ORDER BY
        // sum(disc_price) DESC LIMIT n` is the pre-computed brand_topn
        // sketch, merged across any cuboid — no brand-level scan at all
        val topn = (groupNames, outs, p.limit) match {
          case (Seq("p_brand"), Seq((MCol("revenue"), revName)), Some(n))
              if filterSql.isEmpty && p.havingSql.isEmpty && n <= 4096 &&
                p.sorts.headOption.contains((revName, true)) &&
                p.sorts.tail.forall(_ == ("p_brand", false)) =>
            val r = QueryRouter.routeStates(spark, inst,
              CubeQuery(Nil, Seq("brand_topn" -> "state")))(df)
            if (r.fallback) None
            else Some(r.df
              .select(posexplode(Measures.topnExtract(col("state"), lit(n))))
              .select(col("col._1").as("p_brand"),
                (col("col._2").cast(DoubleType) / 10000.0).as(revName))
              .orderBy(col(revName).desc, col("p_brand")))
          case _ => None
        }
        topn match {
          case Some(t) =>
            val outNames = aggs.map {
              case a: AttributeReference => a.name
              case Alias(_, name) => name
            }
            SqlResult(t.select(outNames.map(col): _*), routed = true,
              "topn-measure")
          case None =>
            // route the union of underlying measures (a derived output
            // like avg needs two), then assemble outputs in SQL order
            val needed = outs.flatMap(_._1.measures).distinct
            val q = CubeQuery(groupNames, needed.map(m => m -> s"__m_$m"),
              filter = filterSql.map(expr),
              filterDims = filterDims)
            val routed = QueryRouter.route(spark, inst, q)(df)
            if (routed.fallback) SqlResult(df, routed = false, "fallback")
            else {
              val outCols = aggs.map {
                case a: AttributeReference => col(a.name)
                case Alias(ae: AggregateExpression, name) =>
                  measureOf(ae).get match {
                    case MCol(m) => col(s"__m_$m").as(name)
                    case MAvgQty =>
                      (col("__m_qty") / col("__m_nrows")).as(name)
                  }
              }
              var out = routed.df.select(outCols: _*)
              p.havingSql.foreach(h => out = out.filter(expr(h)))
              if (p.sortCols.nonEmpty) out = out.orderBy(p.sortCols: _*)
              p.limit.foreach(n => out = out.limit(n))
              SqlResult(out, routed = true, "cuboid")
            }
        }
      case _ => SqlResult(df, routed = false, "fallback")
    }
  }
}
