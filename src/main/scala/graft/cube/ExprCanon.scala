package graft.cube

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Canonicalizer for matching a user-written aggregate argument against
  * a measure's defining raw expression (reference: core-metadata/.../
  * model/FunctionDesc.java — Kylin matches the SQL aggregate's
  * parameter expression against measure metadata, so the literal TPC-H
  * `SUM(l_extendedprice * (1 - l_discount))` finds the cube's revenue
  * measure). Casts, decimal overflow guards, and numeric-literal widths
  * are erased — the analyzer inserts them freely depending on input
  * types, and the measure's exact decimal state answers every numeric
  * widening of the same algebra; attributes compare by lower-cased
  * name.
  */
object ExprCanon {

  /** Strip only LOSSLESS casts, pre-order so a cast sees its ORIGINAL
    * child: the analyzer's widening casts (Cast.canUpCast) and the
    * measure author's own unresolved casts (the defining expression is
    * trusted metadata). A user-written NARROWING cast — e.g.
    * `SUM(CAST(l_extendedprice AS INT) * ...)` — survives, so its
    * canon differs from the measure's and the match refuses instead of
    * serving the untruncated pre-computed state. */
  private def stripSafeCasts(e: Expression): Expression = e match {
    case c: Cast if !c.child.resolved ||
        Cast.canUpCast(c.child.dataType, c.dataType) =>
      stripSafeCasts(c.child)
    case CheckOverflow(child, _, _) => stripSafeCasts(child)
    case other => other.mapChildren(stripSafeCasts)
  }

  private def normalize(e: Expression): Expression =
    stripSafeCasts(e).transformUp {
      case a: AttributeReference => UnresolvedAttribute(a.name.toLowerCase)
      case u: UnresolvedAttribute =>
        UnresolvedAttribute(u.nameParts.last.toLowerCase)
      case l @ Literal(v, _: NumericType) if v != null =>
        Literal(v.toString.toDouble, DoubleType)
      // a Column built from the functions API converts to unresolved
      // arithmetic FUNCTIONS; the analyzed query tree has the concrete
      // operators — unify on the operators
      case f: UnresolvedFunction
          if f.nameParts.sizeIs == 1 && !f.isDistinct &&
            f.arguments.sizeIs == 2 =>
        val Seq(a, b) = f.arguments
        f.nameParts.head match {
          case "*" => Multiply(a, b)
          case "+" => Add(a, b)
          case "-" => Subtract(a, b)
          case "/" => Divide(a, b)
          case _ => f
        }
    }

  /** canonical rendering; None when the tree has no SQL form */
  def canon(e: Expression): Option[String] =
    scala.util.Try(normalize(e).sql).toOption

  /** canonicalized-tree equality */
  def same(a: Expression, b: Expression): Boolean =
    (canon(a), canon(b)) match {
      case (Some(x), Some(y)) => x == y
      case _ => false
    }
}
