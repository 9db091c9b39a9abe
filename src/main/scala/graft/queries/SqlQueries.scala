package graft.queries

import graft.Sql

/** Classic OLAP queries run VERBATIM as SQL text through [[graft.Sql.run]]
  * (TPC-H Q1/Q6/Q3 shapes, dates shifted into the synthetic data's
  * 1995–2001 range) — proving the SQL-text surface reaches the same
  * Catalyst plans and passes the same oracle gate as the DataFrame API.
  *
  * Money math follows the engine's determinism contract: doubles cast to
  * DECIMAL before arithmetic in BOTH engines (decimal products/sums are
  * exact; double folds are order-dependent), outputs cast back to DOUBLE.
  * Averages are explicit sum/count double divisions, never the engines'
  * own AVG (whose internal accumulation differs).
  */
object SqlQueries {

  private val q1Spark = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) *
           (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""

  private val q6Spark = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24"""

  private val q3Spark = """
SELECT l_orderkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10"""

  private val groupingSetsSpark = """
SELECT o_orderstatus, o_orderpriority,
  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
  COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY g_status, g_prio,
  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""

  private val q5Spark = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name"""

  private val q18Spark = """
SELECT c_name, c_custkey, o_orderkey,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150)
GROUP BY c_name, c_custkey, o_orderkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 20"""

  private val existsSpark = """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
ORDER BY c_custkey"""

  val all: Seq[Q] = Seq(
    // B4 completion beyond rollup/cube: arbitrary GROUPING SETS with
    // GROUPING() flags disambiguating real NULLs from subtotal rows —
    // one Expand + one aggregate, same two-phase scale shape as rollup.
    Q("q_sql_grouping_sets", groupingSetsSpark) { (s, d) =>
      Sql.run(s, d, groupingSetsSpark)
    },

    // TPC-H Q1 shape — the pricing-summary scan+agg every OLAP engine is
    // judged on: one fact pass, two-phase hash aggregate on a 6-group key.
    Q("q_sql_tpch_q1", q1Spark) { (s, d) => Sql.run(s, d, q1Spark) },

    // TPC-H Q6 shape — the forecast-revenue filter+sum: every predicate
    // pushes to the parquet scan, aggregate is a single global sum.
    Q("q_sql_tpch_q6", q6Spark) { (s, d) => Sql.run(s, d, q6Spark) },

    // TPC-H Q3 shape — dim->fact->fact join chain with a top-10 by
    // revenue; Catalyst broadcast-joins the filtered customer dim and
    // TakeOrderedAndProject's the limit (no global sort).
    Q("q_sql_tpch_q3", q3Spark) { (s, d) => Sql.run(s, d, q3Spark) },

    // TPC-H Q5 shape — the 6-table local-supplier-volume join: Catalyst
    // reorders/broadcasts the region->nation dim chain onto the fact
    // scan and the c_nationkey = s_nationkey residual rides the supplier
    // broadcast; only the customer⋈orders⋈lineitem spine shuffles.
    Q("q_sql_tpch_q5", q5Spark) { (s, d) => Sql.run(s, d, q5Spark) },

    // TPC-H Q18 shape — large-volume customers: an aggregate-HAVING
    // subquery feeding an IN (planned as a semi-join on the already
    // aggregated keys), then the 3-table join re-aggregates; the limit
    // becomes TakeOrderedAndProject, never a global sort.
    Q("q_sql_tpch_q18", q18Spark) { (s, d) => Sql.run(s, d, q18Spark) },

    // Correlated NOT EXISTS — Catalyst decorrelates the subquery into a
    // left-anti join on the correlation key (never a per-row subquery
    // execution); the o_totalprice predicate pushes into the subquery's
    // scan before the anti-join.
    Q("q_sql_exists", existsSpark) { (s, d) => Sql.run(s, d, existsSpark) }
  )
}
