package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import TextAnalysis.normText

/** Near-duplicate detection for the LLM-data-pipeline surface (SURVEY
  * §2.4 #42–44): MinHash+LSH banding, SimHash hamming buckets, and an
  * exact n-gram-Jaccard join. All candidate generation is
  * bucket-equi-join (shuffle on a band/chunk key) — never an all-pairs
  * cross join — so pair generation stays near-linear at 100 TB
  * (SURVEY §5.7). Exact verification runs only on candidates.
  *
  * Hashes derive from md5 (engine-independent, no JVM hashing), so the
  * DuckDB oracle can replay signatures bit-for-bit where it needs to.
  */
object Dedup {

  // ── shingling ────────────────────────────────────────────────────

  /** distinct 3-word shingles of the whitespace-normalized text */
  def shingles(t: Column): Column = {
    val ws = split(normText(t), " ")
    when(size(ws) >= 3,
      array_distinct(transform(sequence(lit(0), size(ws) - 3),
        i => concat_ws(" ",
          element_at(ws, i + 1), element_at(ws, i + 2), element_at(ws, i + 3)))))
      .otherwise(typedLit(Seq.empty[String]))
  }

  /** (doc_id, sh) with non-empty shingle sets */
  def shingled(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)

  /** 60-bit hash of a string via md5's first 15 hex chars — the one
    * hash primitive both Spark and DuckDB compute identically */
  def h60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast(LongType)

  /** exact Jaccard columns given two shingle-set columns */
  def jaccard(a: Column, b: Column): Column = {
    val x = size(array_intersect(a, b)).cast(DoubleType)
    round(x / (size(a) + size(b) - size(array_intersect(a, b))), 4)
  }

  // ── MinHash + LSH banding ────────────────────────────────────────

  val NumHashes = 64
  val BandRows = 4              // b=16 bands × r=4 rows
  val NumBands: Int = NumHashes / BandRows

  /** minhash_j = min over shingles of h60(j || '|' || shingle) */
  private def minhash(j: Int): Column =
    array_min(transform(col("sh"), s => h60(concat(lit(s"$j|"), s))))

  /** candidate pairs from banded minhash signatures: docs agreeing on
    * all r rows of any band land in the same bucket; the bucket join is
    * an equi-join on (band, key). P(candidate | J=0.9) ≈ 1 − 4e-8. */
  def minhashCandidates(sh: DataFrame): DataFrame = {
    val sig = sh.select(
      col("doc_id") +: (0 until NumHashes).map(j => minhash(j).as(s"mh$j")): _*)
    val bandKeys = (0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (b * BandRows until (b + 1) * BandRows)
          .map(j => col(s"mh$j")): _*).as("key"))
    }
    val buckets = sig
      .select(col("doc_id"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs, exact-verified at `minJaccard` */
  def minhashDupPairs(docs: DataFrame, minJaccard: Double): DataFrame = {
    val sh = shingled(docs)
    minhashCandidates(sh)
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  // ── SimHash ──────────────────────────────────────────────────────

  val SimBits = 60              // h60's width
  val ChunkBits = 6
  val NumChunks: Int = SimBits / ChunkBits   // 10 chunks ⇒ hamming ≤ 9
                                             // provably yields a chunk match
  /** per-doc 60-bit simhash: bit j set iff Σ over shingles of
    * (±1 by hash bit j) ≥ 0. One explode + one hash-agg — no all-pairs
    * anything. */
  def simhashSignatures(sh: DataFrame): DataFrame = {
    val hashed = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), h60(col("s")).as("hv"))
    val bitSums = (0 until SimBits).map(j =>
      sum(when(shiftright(col("hv"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$j"))
    hashed.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until SimBits).map(j =>
          when(col(s"b$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("s64"))
  }

  /** SimHash near-dup pairs with hamming ≤ maxHamming. Candidates via
    * chunk banding: split the signature into NumChunks chunks; hamming
    * ≤ NumChunks−1 pairs MUST agree on some chunk (pigeonhole), so for
    * maxHamming ≤ 9 the bucket join is lossless, not probabilistic. */
  def simhashDupPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming < NumChunks, "banding only lossless below NumChunks")
    val sig = simhashSignatures(shingled(docs))
    val chunkCols = (0 until NumChunks).map(c =>
      shiftright(col("s64"), c * ChunkBits).bitwiseAND((1 << ChunkBits) - 1))
    val buckets = sig.select(col("doc_id"), col("s64"),
        posexplode(array(chunkCols: _*)).as(Seq("chunk", "cv")))
    val ham = expr("bit_count(s64_a ^ s64_b)")
    buckets.as("a").join(buckets.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.s64").as("s64_a"), col("b.s64").as("s64_b"))
      .distinct()
      .select(col("id_a"), col("id_b"), ham.cast(IntegerType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ── exact n-gram Jaccard join ────────────────────────────────────

  /** Exact Jaccard over every pair sharing ≥1 shingle, via an
    * inverted-index equi-join on the shingle (shuffle keyed by
    * shingle, AQE handles frequent-shingle skew; a production 100 TB
    * run would additionally cap document frequency to bound the
    * worst-case bucket — candidates missed by a df-cap share only
    * ultra-common shingles and sit far below any useful threshold). */
  def ngramJaccardPairs(docs: DataFrame, minJaccard: Double): DataFrame = {
    val sh = shingled(docs)
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("x"))
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
    inter
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("x").cast(DoubleType) / (col("n_a") + col("n_b") - col("x")), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
