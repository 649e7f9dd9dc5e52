package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: documents are
  * concatenated in a stable order (doc_id) and cut into fixed
  * token-budget context windows; each document is mapped to the range
  * of chunks it occupies (GPT-style concat-then-chunk packing — the
  * accounting a dataloader needs to slice a packed corpus without
  * materializing the concatenation).
  *
  * The scale problem is the GLOBAL running offset: the naive
  * `Window.orderBy(doc_id)` cumsum moves the whole corpus through one
  * reducer. This uses the classic two-phase scan instead:
  *
  *  1. split the order key's [min, max] span into `partitions` value
  *     ranges; per-range cumsum runs in parallel (each range is one
  *     window group);
  *  2. per-range token totals — a PARTITIONS-sized frame — get their
  *     own tiny cumsum (single reducer over ~10² rows, not 10¹²) and
  *     broadcast back as each range's starting offset.
  *
  * The range id is ARITHMETIC (floor over the key's span, one tiny
  * min/max agg broadcast back), not `repartitionByRange`: the sampled
  * range partitioner seeds its boundaries per RDD instantiation, so a
  * plan referencing the partitioned frame from two join branches
  * could assign a row two different partition ids unless the exchange
  * happens to be reused — a value-derived id is a pure function of
  * the row and cannot disagree with itself. Sparse/skewed keys cost
  * only range imbalance (documented), never correctness. */
object Packing {

  /** `start_off` per row: the sum of `valueCol` over all rows with a
    * smaller `orderCol` (the exclusive running total; `orderCol` must
    * be a numeric key, unique per row — doc ids). Two corpus-sized
    * parallel stages + one tiny prefix job; nothing corpus-sized
    * funnels through one reducer. */
  def withRunningOffset(df: DataFrame, orderCol: String, valueCol: String,
                        partitions: Int = 32): DataFrame = {
    // one column-pruned scan for the key span, broadcast back — the
    // value-range split this derives is deterministic by construction.
    // The id arithmetic runs in DECIMAL: hash-derived keys legitimately
    // span ~2^60, where (key - lo) * partitions would wrap a Long
    // negative and break the id's monotonicity in the key — the
    // invariant the prefix decomposition is built on.
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val stats = df.agg(min(col(orderCol)).cast("long").as("_lo"),
      max(col(orderCol)).cast("long").as("_hi"))
    val withPid = df.crossJoin(broadcast(stats))
      .withColumn("_pid",
        floor((col(orderCol).cast(dec38) - col("_lo").cast(dec38))
            * partitions /
          (col("_hi").cast(dec38) - col("_lo").cast(dec38) + 1))
        .cast("int"))
      .drop("_lo", "_hi")
    val localW = Window.partitionBy("_pid").orderBy(orderCol)
    // the prefix frame has ≤ `partitions` rows: the unpartitioned
    // window below is a deliberate single-reducer over that tiny frame
    val prefixW = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = withPid.groupBy("_pid")
      .agg(sum(col(valueCol)).as("_psum"))
      .withColumn("_prefix",
        coalesce(sum(col("_psum")).over(prefixW), lit(0L)))
      .select("_pid", "_prefix")
    withPid.withColumn("_lcum", sum(col(valueCol)).over(localW))
      .join(broadcast(prefix), "_pid")
      .withColumn("start_off",
        col("_prefix") + col("_lcum") - col(valueCol))
      .drop("_pid", "_lcum")
  }

  /** Chunk range per document (requires every `n_tokens` ≥ 1, which
    * whitespace tokenization guarantees — an empty text is one empty
    * token): `chunk_first`/`chunk_last` index the `budget`-token
    * windows of the doc_id-ordered concatenation this doc's tokens
    * land in; `n_chunks` is how many windows it straddles. */
  def packChunks(docTokens: DataFrame, budget: Long): DataFrame =
    withRunningOffset(docTokens, "doc_id", "n_tokens")
      .withColumn("chunk_first",
        floor(col("start_off") / budget.toDouble).cast("long"))
      .withColumn("chunk_last",
        floor((col("start_off") + col("n_tokens") - 1) / budget.toDouble)
          .cast("long"))
      .withColumn("n_chunks",
        col("chunk_last") - col("chunk_first") + 1L)
}
