package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, EmbeddingSearch}

/** Focused equivalence pins for the r21 optimization-round kernel
  * swaps (round rule: an optimization that changes an operator's
  * internals gets its own test):
  *  - LongDot / LongSqDist (native codegen expressions) must equal the
  *    interpreted aggregate(zip_with(...)) folds they replaced,
  *    including negative coordinates and the left-to-right int64
  *    accumulation order;
  *  - the SimhashAggregator must equal the 60-column
  *    sum(when(shiftright...)) algebra it replaced, including the sign
  *    boundary (bit-sum exactly 0 sets the bit — ">= 0", not "> 0").
  */
class VecExprSpec extends AnyFunSuite {
  import TestSpark._

  private def foldDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  private def foldL2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  private def nativeL2(a: Column, b: Column): Column =
    ColumnBridge.column(graft.functions.LongSqDist(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  test("LongDot/LongSqDist equal the interpreted higher-order folds") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // negative coords, magnitudes at the quantizer's 2^20 range
    val rows = (1 to 64).map { i =>
      (i.toLong,
       Seq.fill(64)(rnd.nextLong() % (1L << 20)),
       Seq.fill(64)(rnd.nextLong() % (1L << 20)))
    }
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      EmbeddingSearch.idot(col("a"), col("b")).as("ndot"),
      foldDot(col("a"), col("b")).as("idot"),
      nativeL2(col("a"), col("b")).as("nl2"),
      foldL2(col("a"), col("b")).as("il2"))
    assert(cmp.filter(col("ndot") =!= col("idot") ||
      col("nl2") =!= col("il2")).count() === 0)
  }

  test("LongDot/LongSqDist refuse mismatched vector lengths loudly") {
    import spark.implicits._
    // the replaced zip_with padded the short side with nulls (NULL
    // result); an unchecked primitive loop would read garbage — the
    // kernels must FAIL instead (ADVICE r21 contract pin)
    val df = Seq((Seq(1L, 2L, 3L), Seq(1L, 2L))).toDF("a", "b")
    val eDot = intercept[Exception] {
      df.select(EmbeddingSearch.idot(col("a"), col("b"))).collect()
    }
    val eL2 = intercept[Exception] {
      df.select(nativeL2(col("a"), col("b"))).collect()
    }
    def rootMsg(t: Throwable): String = {
      var c = t; while (c.getCause != null && (c.getCause ne c)) c = c.getCause
      Option(c.getMessage).getOrElse("")
    }
    assert(rootMsg(eDot).contains("mismatched vector lengths"))
    assert(rootMsg(eL2).contains("mismatched vector lengths"))
  }

  test("simhash typed aggregator equals the 60-column when/sum algebra") {
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    // doc 1 has an even shingle count so some bit-sums can land exactly
    // on 0 (the ">= 0 sets the bit" boundary); docs 2-3 are ordinary
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg hh"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "one two three one two three one two three")
    ).toDF("doc_id", "text")
    val rows = Dedup.shingleRows(docs)
    val newSig = Dedup.simhashSignatures(rows)
    // the replaced formulation, verbatim
    val hashed = rows.select(col("doc_id"), Dedup.h60(col("s")).as("hv"))
    val bitSums = (0 until Dedup.SimBits).map(j =>
      sum(when(shiftright(col("hv"), j).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$j"))
    val oldSig = hashed.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until Dedup.SimBits).map(j =>
          when(col(s"b$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("s64"))
    val joined = newSig.as("n").join(oldSig.as("o"), "doc_id")
    assert(joined.count() === 3)
    assert(joined.filter(col("n.s64") =!= col("o.s64")).count() === 0)
  }
}
