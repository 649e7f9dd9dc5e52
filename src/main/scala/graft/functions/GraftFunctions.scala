package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL API surface: Kylin exposes its measure family to SQL users as
  * functions (bitmap/hll aggregates, intersect_count for retention,
  * percentile). graft mirrors that by registering every measure
  * aggregate + finalizer under a `graft_` prefix, so a SQL-only user
  * can write e.g.
  *
  *   SELECT graft_bitmap_count(graft_bitmap_agg(o_custkey)) FROM orders
  *   SELECT graft_intersect_count(a.bm, b.bm) FROM ...
  *
  * against any registered view — no Scala required (FunctionsSpec
  * drives these through spark.sql). */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_bitmap_agg", Measures.bitmapAgg)
    spark.udf.register("graft_bitmap_union", Measures.bitmapUnion)
    spark.udf.register("graft_bitmap_count", Measures.bitmapCount)
    spark.udf.register("graft_intersect_count", Measures.bitmapAndCount)
    spark.udf.register("graft_intersect_value", Measures.bitmapAndValues)
    spark.udf.register("graft_hll_agg", Measures.hllAgg)
    spark.udf.register("graft_hll_union", Measures.hllUnion)
    spark.udf.register("graft_hll_estimate", Measures.hllEstimate)
    spark.udf.register("graft_topn_agg", Measures.topnAgg)
    spark.udf.register("graft_topn_union", Measures.topnUnion)
    spark.udf.register("graft_topn_extract", Measures.topnExtract)
    spark.udf.register("graft_kll_agg", Measures.kllAgg)
    spark.udf.register("graft_kll_union", Measures.kllUnion)
    spark.udf.register("graft_kll_quantile", Measures.kllQuantile)
    Md5Long60.register(spark)   // native expression, codegen'd
  }
}
