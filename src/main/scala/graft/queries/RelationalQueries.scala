package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.{Layout, Tables}
import graft.functions.WeightedAvg

/** SURVEY.md §2 Part B rows B1–B15 + B24 — the relational core, over the
  * driver's TPC-H-ish tables. Every query is a single declarative DataFrame
  * plan (Catalyst handles pushdown/pruning/two-phase aggregation), carries an
  * exact DuckDB oracle, and ends in a total ORDER BY.
  *
  * Determinism: money aggregates go through exact DECIMAL(18,2) (the source
  * doubles are 2-decimal values, so the cast is exact and the sum is
  * order-independent); products like extendedprice*(1-discount) are computed
  * once in IEEE double (bitwise identical in both engines) and then cast to
  * DECIMAL(28,10) before summing (scale 10 makes cast-rounding ties
  * unreachable from double inputs).
  */
object RelationalQueries {

  /** Exact money: the parquet doubles are 2-decimal; cast is exact. */
  private def dec2(c: Column): Column = c.cast("decimal(18,2)")
  /** Order-independent sum of money, surfaced as double for the compare.
    * Decimal->double outputs must keep value*10^scale < 2^53: DuckDB casts
    * decimal to double via its backing integer, which silently rounds when
    * the integer exceeds the mantissa — so wide-scale sums get ROUND(.., 2)
    * before the final cast. */
  private def moneySum(c: Column): Column = sum(dec2(c)).cast("double")
  /** Deterministic double product -> exact decimal for order-free summing. */
  private def dec10(c: Column): Column = c.cast("decimal(28,10)")

  private val revenue: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val revenueSql = "l_extendedprice * (1.0 - l_discount)"

  val all: Seq[Q] = Seq(

    // B1 — filter + arithmetic projection; per-row IEEE double is exact.
    Q("q_filter_project",
      s"""SELECT l_orderkey, l_linenumber, l_quantity, $revenueSql AS revenue
FROM lineitem WHERE l_discount > 0.05 AND l_quantity < 10
ORDER BY l_orderkey, l_linenumber""") { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_discount") > 0.05 && col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          revenue.as("revenue"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // B2 — TPC-H Q1-shaped hash aggregation (partial+final via Catalyst).
    Q("q_agg_hash",
      s"""SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST($revenueSql AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""") { (s, d) =>
      Tables.spreadSmall(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          round(sum(dec10(revenue)), 2).cast("double").as("sum_disc_price"),
          (moneySum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // B3 — distinct aggregation (expand+two-phase under Catalyst).
    Q("q_agg_distinct",
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_ord
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_ord"))
        .orderBy("o_orderstatus")
    },

    // B4 — rollup over the region->nation->customer->orders chain. Dims are
    // broadcast; the single shuffle is the rollup aggregation itself.
    Q("q_rollup",
      """SELECT r_name, n_name,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
  COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""") { (s, d) =>
      Tables.spreadSmall(s, d, "orders")
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(moneySum(col("o_totalprice")).as("total_spent"),
          count(lit(1)).as("n_orders"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    },

    // B5 — broadcast hash join: fact lineitem never shuffles for the dim.
    Q("q_join_broadcast",
      s"""SELECT p_brand, COUNT(*) AS n_items,
  CAST(ROUND(SUM(CAST($revenueSql AS DECIMAL(28,10))), 2) AS DOUBLE) AS brand_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand""") { (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(dec10(revenue)), 2).cast("double").as("brand_revenue"))
        .orderBy("p_brand")
    },

    // B6 — shuffle (sort-merge) join, forced via merge hint: both sides
    // hash-partition on the key; at 100 TB this is the co-located-join shape
    // (bucketed tables would elide the shuffle entirely).
    Q("q_join_shuffle",
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
      Tables.orders(s, d).hint("merge")
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"), moneySum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderpriority")
    },

    // B6' — the SAME join co-located via bucketing ([[graft.sources
    // .Layout.bucketed]]): both sides materialized bucketed+sorted on the
    // join key, so the sort-merge join runs with ZERO Exchange on either
    // side (BucketingSpec pins it on this query's plan) — the only
    // shuffles left in the whole query are the tiny post-join groupBy and
    // the output sort. Same oracle SQL as q_join_shuffle: identical
    // results, two fewer data-scale shuffles. At 100 TB this is the
    // repeated-join shape: the layout is written once (a nightly job) and
    // every consumer joins shuffle-free afterwards.
    Q("q_join_bucketed",
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
      Layout.bucketed(s, d, "orders", "o_orderkey").hint("merge")
        .join(Layout.bucketed(s, d, "lineitem", "l_orderkey"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"), moneySum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderpriority")
    },

    // B7a — left-semi: customers having at least one urgent order.
    Q("q_join_semi",
      """SELECT c_custkey FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
ORDER BY c_custkey""") { (s, d) =>
      val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      Tables.customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"))
        .orderBy("c_custkey")
    },

    // B7b — left-anti: customers with no urgent order.
    Q("q_join_anti",
      """SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
ORDER BY c_custkey""") { (s, d) =>
      val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      Tables.customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy("c_custkey")
    },

    // B8 — left outer join + per-customer aggregate.
    Q("q_join_outer",
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey ORDER BY c_custkey""") { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(moneySum(col("o_totalprice")), lit(0.0)).as("total_spent"))
        .orderBy("c_custkey")
    },

    // B10a — ranking window: each customer's single largest order.
    Q("q_window_rank",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn = 1 ORDER BY o_custkey""") { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey")
    },

    // B10b — frame window (running sum) + analytic lag, one pass per key.
    Q("q_window_frame",
      """SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spent,
  LAG(o_totalprice) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS prev_price
FROM orders ORDER BY o_custkey, o_orderkey""") { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec2(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_spent"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // B11 — top-k: TakeOrderedAndProject, no full sort, no full shuffle.
    Q("q_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""") { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // B12 — set ops. Spark union == UNION ALL; intersect/except are distinct.
    Q("q_union",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
UNION ALL
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
ORDER BY c_custkey""") { (s, d) =>
      val c = Tables.customer(s, d)
      c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
        .union(c.filter(col("c_acctbal") > 5000).select(col("c_custkey")))
        .orderBy("c_custkey")
    },

    Q("q_intersect",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
ORDER BY c_custkey""") { (s, d) =>
      val c = Tables.customer(s, d)
      c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
        .intersect(c.filter(col("c_acctbal") > 5000).select(col("c_custkey")))
        .orderBy("c_custkey")
    },

    Q("q_except",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
ORDER BY c_custkey""") { (s, d) =>
      val c = Tables.customer(s, d)
      c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
        .except(c.filter(col("c_acctbal") > 5000).select(col("c_custkey")))
        .orderBy("c_custkey")
    },

    // B12' — multiset set ops: EXCEPT ALL / INTERSECT ALL preserve
    // multiplicities (the distinct forms above would collapse them), so
    // the inputs are lineitem supplier bags where duplicates are real.
    Q("q_except_all",
      """SELECT l_suppkey FROM (
  SELECT l_suppkey FROM lineitem WHERE l_quantity < 10
  EXCEPT ALL
  SELECT l_suppkey FROM lineitem WHERE l_quantity > 40)
ORDER BY l_suppkey""") { (s, d) =>
      val li = Tables.lineitem(s, d)
      li.filter(col("l_quantity") < 10).select(col("l_suppkey"))
        .exceptAll(li.filter(col("l_quantity") > 40).select(col("l_suppkey")))
        .orderBy("l_suppkey")
    },

    Q("q_intersect_all",
      """SELECT l_suppkey FROM (
  SELECT l_suppkey FROM lineitem WHERE l_quantity < 10
  INTERSECT ALL
  SELECT l_suppkey FROM lineitem WHERE l_quantity > 40)
ORDER BY l_suppkey""") { (s, d) =>
      val li = Tables.lineitem(s, d)
      li.filter(col("l_quantity") < 10).select(col("l_suppkey"))
        .intersectAll(li.filter(col("l_quantity") > 40).select(col("l_suppkey")))
        .orderBy("l_suppkey")
    },

    // B13 — string function family (all codegen'd built-ins).
    Q("q_string_funcs",
      """SELECT p_partkey, UPPER(p_name) AS uname, SUBSTRING(p_name, 1, 4) AS pfx,
  p_brand || '-' || p_type AS brand_type, CAST(LENGTH(p_name) AS INT) AS name_len,
  p_name LIKE '%red%' AS is_red,
  TRY_CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INT) AS brand_num,
  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
FROM part ORDER BY p_partkey""") { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 4).as("pfx"),
          concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"),
          length(col("p_name")).as("name_len"),
          col("p_name").like("%red%").as("is_red"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).cast("int").as("brand_num"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
        .orderBy("p_partkey")
    },

    // B14 — date/time bucketing.
    Q("q_date_funcs",
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y, CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
FROM orders GROUP BY 1, 2, 3 ORDER BY y, m""") { (s, d) =>
      Tables.orders(s, d)
        .groupBy(
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
            .as("month_start"))
        .agg(count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("total_spent"))
        .orderBy("y", "m")
    },

    // B15 — math family; sqrt is IEEE-exact in both engines, round is
    // half-away-from-zero in both (probed), pow/exp/ln avoided (libm ulps).
    Q("q_math_funcs",
      s"""SELECT l_orderkey, l_linenumber,
  ABS(l_tax - l_discount) AS tax_disc_gap,
  CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
  CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
  CAST(ROUND(CAST($revenueSql AS DECIMAL(28,10)), 2) AS DOUBLE) AS revenue_r2,
  SQRT(l_quantity) AS qty_sqrt,
  l_orderkey % 7 AS key_mod
FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""") { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_tax") - col("l_discount")).as("tax_disc_gap"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          // round via exact decimal, not double: Spark rounds the shortest
          // decimal repr of a double, DuckDB the binary value — they differ
          // at .xx5 boundaries; both agree once the value is DECIMAL.
          round(dec10(revenue), 2).cast("double").as("revenue_r2"),
          sqrt(col("l_quantity")).as("qty_sqrt"),
          (col("l_orderkey") % 7).as("key_mod"))
        .orderBy("l_orderkey")
    },

    // B24 — typed UDAF (Aggregator): exact-decimal weighted average of
    // extendedprice by quantity; numerator/denominator are order-free.
    Q("q_udaf_weighted_avg",
      """SELECT l_returnflag,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
      val wavg = udaf(WeightedAvg)
      Tables.spreadSmall(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(wavg(dec2(col("l_extendedprice")), dec2(col("l_quantity")))
          .as("wavg_price"))
        .orderBy("l_returnflag")
    },

    // B7' — null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL
    // keys match each other instead of vanishing, the semantic SQL `=`
    // can't express. Keys are derived (NULLIF) since the synthetic data
    // has no natural NULLs; Spark plans <=> as a proper hash join key
    // (EqualNullSafe is a valid equi-join key, not a nested loop).
    Q("q_join_nullsafe",
      """WITH c AS (
  SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg FROM customer),
s AS (
  SELECT NULLIF(seg, 'BUILDING') AS seg, cnt FROM (
    SELECT c_mktsegment AS seg, COUNT(*) AS cnt FROM customer GROUP BY 1))
SELECT c.c_custkey, COALESCE(c.seg, 'NULL_SEG') AS seg_out, s.cnt
FROM c JOIN s ON c.seg IS NOT DISTINCT FROM s.seg
ORDER BY c_custkey""") { (s, d) =>
      val cust = Tables.customer(s, d)
      val c = cust.select(col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
      val dim = cust.groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("cnt"))
        .select(nullif(col("seg"), lit("BUILDING")).as("seg2"), col("cnt"))
      c.join(dim, col("seg") <=> col("seg2"))
        .select(col("c_custkey"),
          coalesce(col("seg"), lit("NULL_SEG")).as("seg_out"), col("cnt"))
        .orderBy("c_custkey")
    },

    // B10×B24 — the typed UDAF used as a WINDOW function: per customer, a
    // rolling 3-order weighted average of order value (weighted by the
    // order's day-of-month). Same Aggregator instance as the grouped
    // form. The frame order (o_orderdate, o_orderkey) is a TOTAL order —
    // (l_orderkey, l_linenumber) on lineitem is NOT unique in this data
    // and a nondeterministic frame silently shuffles the rolling values.
    // Partitions are per-customer: many small groups, parallel at scale.
    Q("q_window_udaf",
      """SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) *
           CAST(EXTRACT(DAY FROM o_orderdate) AS DECIMAL(18,2))) OVER w AS DOUBLE) /
  CAST(SUM(CAST(EXTRACT(DAY FROM o_orderdate) AS DECIMAL(18,2))) OVER w AS DOUBLE)
    AS rolling_wavg
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey""") { (s, d) =>
      val wavg = udaf(WeightedAvg)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          wavg(dec2(col("o_totalprice")), dec2(dayofmonth(col("o_orderdate"))))
            .over(w).as("rolling_wavg"))
        .orderBy("o_custkey", "o_orderkey")
    }
  )
}
