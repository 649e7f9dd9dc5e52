package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, EmbeddingSearch}

/** Invariants of the §2.4 pipeline ops that the DuckDB oracle can't
  * express directly (the oracle checks values; these check the
  * *relationships* between the bucketed scale paths and their exact
  * baselines). */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._
  private implicit def s: org.apache.spark.sql.SparkSession = spark

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val embs = Tables.embeddings(spark, sf)

  test("minhash-LSH finds exactly the ground-truth pairs at J >= 0.8") {
    val lsh = Dedup.minhashDupPairs(docs, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccardPairs(docs, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact && exact.nonEmpty)
  }

  test("simhash chunk banding is lossless: every hamming<=9 pair survives bucketing") {
    // all-pairs ground truth from the signatures themselves
    val sig = Dedup.simhashSignatures(Dedup.shingleRows(docs))
    val truth = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        expr("bit_count(a.s64 ^ b.s64)").as("h"))
      .filter(col("h") <= 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.simhashDupPairs(docs, 9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == truth && truth.nonEmpty)
  }

  test("LSH top-k cosines are bounded by brute-force top-k rank-for-rank") {
    val bf = EmbeddingSearch.bruteForceTopK(embs, 8, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val lsh = EmbeddingSearch.lshTopK(embs, 8, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(lsh.nonEmpty)
    lsh.foreach { case (q, rank, cos) =>
      val bfCos = bf((q, rank))
      assert(cos <= bfCos + 1e-9,
        s"LSH rank-$rank cosine $cos for query $q beats brute force $bfCos")
    }
  }

  test("exact dedup keeps one survivor per distinct normalized text") {
    val out = SparkEntry.queries("doc_exact_dedup")(spark, sf)
    val distinctTexts = docs
      .select(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .distinct().count()
    assert(out.count() == distinctTexts)
  }

  test("quantized cosine agrees with a double-precision reference within 1e-4") {
    val q = EmbeddingSearch.quantized(embs.limit(50))
    val got = q.as("a").join(q.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        EmbeddingSearch.cosine(
          EmbeddingSearch.idot(col("a.q"), col("b.q")),
          col("a.n2"), col("b.n2")).as("c"))
      .collect()
    val ref = embs.limit(50).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    got.foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (va, vb) = (ref(a), ref(b))
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum
      val exact = dot / math.sqrt(va.map(x => x * x).sum * vb.map(x => x * x).sum)
      assert(math.abs(c - exact) < 1e-4, s"pair ($a,$b): $c vs $exact")
    }
  }
}
