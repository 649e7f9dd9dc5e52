package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the top 60 bits of md5(s) as a
  * non-negative long — exactly `conv(substring(md5(s), 1, 15), 16, 10)`
  * (the engine-portable hash primitive used by the dedup suite, see
  * Dedup.h60), but computed straight from the digest bytes inside
  * whole-stage codegen: no hex-string materialization, no substring
  * copy, no base-16 parse. Called ~1M times per dedup query at sf0.1,
  * so the three avoided allocations per call are the hot path.
  *
  * This is the "(b) custom Expression with doGenCode" tier of the
  * architecture rules: same semantics as the builtin chain (the DuckDB
  * oracle replays the hex formulation and hashes must match
  * bit-for-bit), cheaper plumbing.
  */
case class Md5Long60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Md5Long60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Long60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long60 =
    copy(child = newChild)
}

object Md5Long60 {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** first 60 bits of md5 as a long — equal to parsing the first 15
    * hex chars (8 digest bytes big-endian, low nibble dropped) */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  /** register `graft_md5_60` so expr()/SQL can use the native
    * expression (SparkSessionExtensions-style function injection) */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_md5_60", exprs => Md5Long60(exprs.head), "built-in")
}
