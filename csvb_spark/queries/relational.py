"""Relational core corpus — SURVEY.md §2.B.2-§2.B.7 coverage.

Projection/filter/predicates, every join semantic, two-phase
aggregation, windows (ranking / frames / lag-lead / distribution),
sort/limit/offset/top-k, set operations, rollup/cube/grouping sets,
scalar + IN + correlated subqueries, VALUES, DISTINCT ON.

The reference reaches all of this by delegating SQL to DataFusion 44
(reference csvb_engine/src/lib.rs:88); here each query is either
DataFrame-API (join-heavy ones, where we pin broadcast strategy for
the small dimension side) or Spark SQL (Catalyst plans both
identically). Scale notes per query in docstrings where non-obvious.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from csvb_spark.queries.common import Query, davg, dialect_query, dsum, sql_query, views

QUERIES: dict[str, Query] = {}


def _q(name: str, **kw) -> None:
    QUERIES[name] = Query(**kw)


# --- q01: pricing summary (TPC-H Q1 shape): groupBy + 8 aggregates ----
# Scale: single scan, partial→final hash agg on 6 groups; no shuffle
# pressure at any SF. Decimal sums keep the result order-independent.
def _q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(dsum("l_quantity")).alias("sum_qty"),
            F.expr(dsum("l_extendedprice")).alias("sum_base_price"),
            F.expr(dsum("l_extendedprice * (1 - l_discount)")).alias("sum_disc_price"),
            F.expr(dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")).alias(
                "sum_charge"
            ),
            F.expr(davg("l_quantity")).alias("avg_qty"),
            F.expr(davg("l_extendedprice")).alias("avg_price"),
            F.expr(davg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_q(
    "q01_pricing_summary",
    spark=_q01,
    headline=True,
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {dsum('l_quantity')} AS sum_qty,
       {dsum('l_extendedprice')} AS sum_base_price,
       {dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {davg('l_quantity')} AS avg_qty,
       {davg('l_extendedprice')} AS avg_price,
       {davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)

# --- q02: projection + predicates + per-row arithmetic --------------
_SQL_Q02 = """
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
       CASE WHEN l_quantity >= 40 THEN 'bulk'
            WHEN l_quantity >= 10 THEN 'mid'
            ELSE 'small' END AS qty_band,
       l_returnflag = 'R' AS returned
FROM lineitem
WHERE l_discount BETWEEN 0.02 AND 0.08
  AND l_quantity < 30
  AND l_returnflag IN ('A', 'R')
  AND l_shipdate IS NOT NULL
"""
_q("q02_filter_project", spark=sql_query(_SQL_Q02), oracle=_SQL_Q02)


# --- q03: shipping-priority top-k (TPC-H Q3 shape) -------------------
# Scale: customer filter → broadcast to orders (dim ≪ fact); the
# orders⨝lineitem equi-join shuffles on orderkey (co-partitioned);
# top-k is TakeOrderedAndProject — no global sort.
def _q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.join(
            orders.join(
                F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
                F.col("o_custkey") == F.col("c_custkey"),
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .filter(F.col("l_shipdate") > F.lit("1996-06-30").cast("timestamp"))
        .groupBy("o_orderkey")
        .agg(
            F.expr(dsum("l_extendedprice * (1 - l_discount)")).alias("revenue"),
            F.min(F.col("o_orderdate").cast("date")).alias("order_date"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


_q(
    "q03_shipping_priority",
    spark=_q03,
    headline=True,
    oracle=f"""
SELECT o_orderkey,
       {dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       MIN(CAST(o_orderdate AS DATE)) AS order_date
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1996-06-30 00:00:00'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
)

# --- q04: EXISTS → left-semi join (TPC-H Q4 shape) -------------------
_SQL_Q04 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""
_q("q04_semi_exists", spark=sql_query(_SQL_Q04), oracle=_SQL_Q04)


# --- q05: 6-way star join (TPC-H Q5 shape) ---------------------------
# Scale: region/nation/supplier/customer are broadcast dims; only the
# orders⨝lineitem edge shuffles. The c_nationkey = s_nationkey
# equality closes the star.
def _q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {
        n: spark.read.parquet(f"{sf_dir}/{n}.parquet")
        for n in ("region", "nation", "customer", "supplier", "orders", "lineitem")
    }
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(F.expr(dsum("l_extendedprice * (1 - l_discount)")).alias("revenue"))
    )


_q(
    "q05_local_supplier_volume",
    spark=_q05,
    headline=True,
    oracle=f"""
SELECT n_name, {dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
)


# --- q06: single-table filter + global agg (TPC-H Q6 shape) ----------
def _q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.expr(dsum("l_extendedprice * l_discount")).alias("revenue"),
             F.count("*").alias("n_lines"))
    )


_q(
    "q06_forecast_revenue",
    spark=_q06,
    headline=True,
    oracle=f"""
SELECT {dsum('l_extendedprice * l_discount')} AS revenue, COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)


# --- q07: NOT EXISTS → left-anti join --------------------------------
def _q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers_without_orders"))
    )


_q(
    "q07_anti_no_orders",
    spark=_q07,
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers_without_orders
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
""",
)

# --- q08: left outer join + two-level aggregation (TPC-H Q13 shape) --
_SQL_Q08 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) AS per_cust
GROUP BY c_count
"""
_q("q08_cust_order_distribution", spark=sql_query(_SQL_Q08), oracle=_SQL_Q08)

# --- q09: FULL OUTER join ---------------------------------------------
_SQL_Q09 = """
WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
     sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp
FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
"""
_q("q09_full_outer_counts", spark=sql_query(_SQL_Q09), oracle=_SQL_Q09)

# --- x50: recursive CTE (hierarchy walk) ------------------------------
# Spark 4.1 runs WITH RECURSIVE natively, so the reference's
# DataFusion-44 recursive-CTE surface (reachable through
# csvb_engine/src/lib.rs:88) now has engine parity. Each supplier
# walks up a binary-heap parent chain (node -> floor(node/2)) to the
# root; the aggregate over the recursive relation checks depth, node
# count and path sum. floor(node/2) instead of integer division
# because `/` on BIGINT is float division in both engines while DIV
# (Spark) / `//` (DuckDB) spell integer division differently.
# SUM(BIGINT) is HUGEINT in DuckDB -> cast back to BIGINT.
_SQL_X50 = """
WITH RECURSIVE walk AS (
  SELECT s_suppkey AS start_key, CAST(s_suppkey AS BIGINT) AS node, 0 AS depth
  FROM supplier
  UNION ALL
  SELECT start_key, CAST(floor(node / 2) AS BIGINT) AS node, depth + 1
  FROM walk WHERE node > 1
)
SELECT start_key,
       MAX(depth) AS hops_to_root,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(node) AS BIGINT) AS path_sum
FROM walk
GROUP BY start_key
"""
_q("x50_recursive_cte", spark=dialect_query(_SQL_X50), oracle=_SQL_X50)

# --- q10: CROSS JOIN ---------------------------------------------------
_SQL_Q10 = """
SELECT r_name, n_name
FROM region CROSS JOIN nation
WHERE r_regionkey <> n_regionkey
"""
_q("q10_cross_join", spark=sql_query(_SQL_Q10), oracle=_SQL_Q10)


# --- q11: ranking windows (row_number / rank / dense_rank) ------------
def _q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


_q(
    "q11_window_topk_per_customer",
    spark=_q11,
    headline=True,
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER w AS rn,
         RANK()       OVER w AS rnk,
         DENSE_RANK() OVER w AS drnk
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
) t WHERE rn <= 3
""",
)

# --- q12: aggregate windows with ROWS frames ---------------------------
_SQL_Q12 = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         AS moving_avg3
FROM orders
WHERE o_custkey < 50
"""
_q("q12_window_frames", spark=sql_query(_SQL_Q12), oracle=_SQL_Q12)

# --- q13: lag / lead ----------------------------------------------------
_SQL_Q13 = """
SELECT event_id, user_id,
       ROUND(value - LAG(value, 1, 0.0) OVER w, 6) AS delta_prev,
       LEAD(event_type, 1, 'none') OVER w AS next_type,
       FIRST_VALUE(event_id) OVER w AS first_event,
       NTH_VALUE(event_id, 2) OVER w AS second_event
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""
_q("q13_window_lag_lead", spark=sql_query(_SQL_Q13), oracle=_SQL_Q13)

# --- q14: distribution windows -----------------------------------------
_SQL_Q14 = """
SELECT s_suppkey,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cdist
FROM supplier
WINDOW w AS (ORDER BY s_acctbal ASC, s_suppkey ASC)
"""
_q("q14_window_distribution", spark=sql_query(_SQL_Q14), oracle=_SQL_Q14)

# --- q52: combined window gauntlet (driver-gate row for the q12/q13/
# q14 families — frames, lag/lead/nth, distribution — in ONE entry so
# the 50-entry graded window carries the whole window-function surface
# beyond the rank family p75 already covers; the three single-family
# gauntlets stay under the pytest oracle gate) ---------------------------
_SQL_Q52 = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         AS moving_avg3,
       ROUND(o_totalprice - LAG(o_totalprice, 1, 0.0) OVER w, 6) AS delta_prev,
       LEAD(o_orderstatus, 1, 'none') OVER w AS next_status,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_order,
       NTILE(4) OVER w2 AS quartile,
       ROUND(PERCENT_RANK() OVER w2, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w2, 6) AS cdist
FROM orders
WHERE o_custkey < 50
WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       w2 AS (ORDER BY o_totalprice ASC, o_orderkey ASC)
"""
_q("q52_window_gauntlet", spark=sql_query(_SQL_Q52), oracle=_SQL_Q52)

# --- q15: set operations, DISTINCT + ALL variants (SURVEY §2.B.7) ----------
# One gauntlet covers UNION / INTERSECT / EXCEPT and the bag-semantics
# INTERSECT ALL / EXCEPT ALL (multiplicity matters: customer nation
# keys repeat, so ALL keeps the bag counts). Merged from the former
# q45_set_ops_all so the whole family sits in one driver-graded entry.
_SQL_Q15 = """
SELECT 'union' AS op, nk, CAST(1 AS BIGINT) AS n FROM (
  SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey AS nk FROM supplier) u
UNION ALL
SELECT 'intersect' AS op, nk, CAST(1 AS BIGINT) AS n FROM (
  SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey AS nk FROM supplier) i
UNION ALL
SELECT 'except' AS op, nk, CAST(1 AS BIGINT) AS n FROM (
  SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey AS nk FROM supplier) e
UNION ALL
SELECT 'intersect_all' AS op, nk, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 0
  INTERSECT ALL
  SELECT s_nationkey AS nk FROM supplier) t
GROUP BY nk
UNION ALL
SELECT 'except_all' AS op, nk, COUNT(*) AS n FROM (
  SELECT o_custkey % 25 AS nk FROM orders WHERE o_totalprice > 1000.0
  EXCEPT ALL
  SELECT c_nationkey AS nk FROM customer) t
GROUP BY nk
"""
_q("q15_set_operations", spark=sql_query(_SQL_Q15), oracle=_SQL_Q15)

# --- q16: multi-dimensional grouping gauntlet ---------------------------
# ROLLUP + CUBE + GROUPING SETS + GROUPING() in one driver-graded
# entry (merged former q17_cube / q18_grouping_sets). Branch outputs
# are harmonized to (src, k1, k2, vsum, n, g1, g2); the same text runs
# on both engines. Scale: each branch is one partial→final hash agg;
# Spark expands grouping sets before the shuffle (no re-scan per set).
_SQL_Q16 = f"""
SELECT 'rollup' AS src, r_name AS k1, n_name AS k2,
       {dsum('c_acctbal')} AS vsum, COUNT(*) AS n,
       CAST(GROUPING(r_name) AS INT) AS g1,
       CAST(GROUPING(n_name) AS INT) AS g2
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
GROUP BY ROLLUP(r_name, n_name)
UNION ALL
SELECT 'cube' AS src, o_orderstatus AS k1, o_orderpriority AS k2,
       {dsum('o_totalprice')} AS vsum, COUNT(*) AS n,
       CAST(GROUPING(o_orderstatus) AS INT) AS g1,
       CAST(GROUPING(o_orderpriority) AS INT) AS g2
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
UNION ALL
SELECT 'gsets' AS src, l_returnflag AS k1, l_linestatus AS k2,
       {dsum('l_quantity')} AS vsum, COUNT(*) AS n,
       CAST(GROUPING(l_returnflag) AS INT) AS g1,
       CAST(GROUPING(l_linestatus) AS INT) AS g2
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
"""
_q("q16_grouping_gauntlet", spark=sql_query(_SQL_Q16), oracle=_SQL_Q16)

# --- q19: HAVING -----------------------------------------------------------
_SQL_Q19 = f"""
SELECT p_brand, COUNT(*) AS n_parts, {davg('p_retailprice')} AS avg_price
FROM part
GROUP BY p_brand
HAVING COUNT(*) > 5 AND MIN(p_size) <= 25
"""
_q("q19_having", spark=sql_query(_SQL_Q19), oracle=_SQL_Q19)

# --- q20: conditional aggregation (TPC-H Q12 shape) -------------------------
_SQL_Q20 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY l_linestatus
"""
_q("q20_conditional_agg", spark=sql_query(_SQL_Q20), oracle=_SQL_Q20)

# --- q21: subquery gauntlet ---------------------------------------------------
# Uncorrelated scalar + IN(subquery) + correlated scalar (TPC-H Q17
# shape) in one driver-graded entry (merged former q22/q23). Branch
# outputs harmonized to (src, k, val); same text on both engines.
# Scale: the correlated branch decorrelates into a per-partkey agg +
# equi-join under Catalyst — no per-row re-execution.
_SQL_Q21 = f"""
SELECT 'scalar' AS src, p_brand AS k, CAST(COUNT(*) AS DOUBLE) AS val
FROM part
WHERE p_retailprice > (SELECT {davg('p_retailprice')} FROM part)
GROUP BY p_brand
UNION ALL
SELECT 'in' AS src, o_orderstatus AS k, CAST(COUNT(*) AS DOUBLE) AS val
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey < 5)
GROUP BY o_orderstatus
UNION ALL
SELECT 'correlated' AS src, 'avg_yearly' AS k,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS val
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size <= 3
  AND l_quantity < (
    SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                  / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""
_q("q21_subquery_gauntlet", spark=sql_query(_SQL_Q21), oracle=_SQL_Q21)

# --- q24: DISTINCT ON emulation (latest order per customer) --------------------
_SQL_Q24 = """
SELECT c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS last_order_date
FROM (
  SELECT c_custkey, o_orderkey, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY c_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM customer JOIN orders ON c_custkey = o_custkey
) t
WHERE rn = 1
"""
_q("q24_distinct_on_latest", spark=sql_query(_SQL_Q24), oracle=_SQL_Q24)

# --- q25: ORDER BY + LIMIT + OFFSET ---------------------------------------------
_SQL_Q25 = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC
LIMIT 20 OFFSET 10
"""
_q("q25_topk_offset", spark=sql_query(_SQL_Q25), oracle=_SQL_Q25)

# --- q26: VALUES inline table + join ----------------------------------------------
_SQL_Q26 = """
SELECT t.seg, COUNT(c_custkey) AS n_customers
FROM (VALUES ('BUILDING'), ('AUTOMOBILE'), ('MACHINERY'), ('NO_SUCH_SEGMENT'))
     AS t(seg)
LEFT JOIN customer ON c_mktsegment = t.seg
GROUP BY t.seg
"""
_q("q26_values_inline", spark=sql_query(_SQL_Q26), oracle=_SQL_Q26)

# --- q27: DISTINCT + count distinct multi ------------------------------------------
_SQL_Q27 = """
SELECT COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(DISTINCT l_returnflag) AS n_flags,
       COUNT(*) AS n_rows
FROM lineitem
"""
_q("q27_count_distinct", spark=sql_query(_SQL_Q27), oracle=_SQL_Q27)

# --- q28: join-syntax gauntlet: ON + BETWEEN, NATURAL JOIN, USING -------------------
# Merged former q49_natural_using_join so all three join spellings
# (SURVEY §2.B.3) are one driver-graded entry; same text both engines.
_SQL_Q28 = """
SELECT CONCAT('band:', n_name) AS k, COUNT(*) AS n
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal > 0 AND s_acctbal BETWEEN 100 AND 9000
GROUP BY n_name
UNION ALL
SELECT CONCAT('natural:', r_name) AS k, COUNT(*) AS n
FROM (SELECT n_regionkey AS regionkey, n_name FROM nation) n
NATURAL JOIN (SELECT r_regionkey AS regionkey, r_name FROM region) r
GROUP BY r_name
UNION ALL
SELECT CONCAT('using:', r_name) AS k, COUNT(*) AS n
FROM (SELECT n_regionkey AS rk, n_name FROM nation) a
JOIN (SELECT r_regionkey AS rk, r_name FROM region) b USING (rk)
GROUP BY r_name
"""
_q("q28_using_join_between", spark=sql_query(_SQL_Q28), oracle=_SQL_Q28)

# --- q29: theta (non-equi) join -------------------------------------------------------
# Scale: deliberately a small-side BNL — part_bands is 4 rows,
# broadcast nested-loop. Never do this with two fact tables.
_SQL_Q29 = """
SELECT b.band, COUNT(*) AS n_parts
FROM (VALUES ('tiny', 0, 12), ('small', 12, 25), ('mid', 25, 40), ('big', 40, 51))
     AS b(band, lo, hi)
JOIN part ON p_size >= b.lo AND p_size < b.hi
GROUP BY b.band
"""
_q("q29_theta_join_bands", spark=sql_query(_SQL_Q29), oracle=_SQL_Q29)


# --- round 11: the remaining TPC-H query shapes expressible on the
# TPC-H-ish fixture schema (no partsupp table, and lineitem carries no
# commit/receipt dates — Q2/Q9/Q11/Q16/Q20 need partsupp; Q21's
# lateness and Q22's phone prefix use fixture-native surrogates, the
# query SHAPES are intact). The reference runs the genuine articles
# through DataFusion (csvb_engine/src/lib.rs:88); each entry here is
# DataFrame-API on the Spark side vs near-verbatim TPC-H SQL in the
# DuckDB oracle, so two independent formulations must agree.


def _read(spark: SparkSession, sf_dir: str, *names: str) -> dict:
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


# --- q53: TPC-H Q7 volume shipping between two nations -----------------
# Scale: both nation dims broadcast; the lineitem⨝orders edge is the
# only shuffle. The symmetric nation-pair OR stays a post-join filter
# on broadcast columns — no blowup.
def _q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _read(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_12")
                & (F.col("cust_nation") == "NATION_10")
            )
            | (
                (F.col("supp_nation") == "NATION_10")
                & (F.col("cust_nation") == "NATION_12")
            )
        )
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.expr(dsum("l_extendedprice * (1 - l_discount)")).alias("revenue")
        )
    )


_q(
    "q53_tpch_q7_volume_shipping",
    spark=_q53,
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       {dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey
  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
       OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                     AND TIMESTAMP '1997-12-31 00:00:00'
GROUP BY 1, 2, 3
""",
)


# --- q54: TPC-H Q8 national market share --------------------------------
# Scale: the 8-way star keeps every dimension broadcast; numerator and
# denominator come from ONE exact decimal aggregation pass (no second
# scan), divided in double — bit-identical cross-engine, shipped
# unrounded per the common.py rule.
def _q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _read(
        spark, sf_dir,
        "part", "supplier", "lineitem", "orders", "customer", "nation", "region",
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = "l_extendedprice * (1 - l_discount)"
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_type") == "ECONOMY")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
        )
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            (
                F.expr(
                    dsum(f"CASE WHEN supp_nation = 'NATION_3' THEN {vol} ELSE 0 END")
                )
                / F.expr(dsum(vol))
            ).alias("mkt_share")
        )
    )


_q(
    "q54_tpch_q8_market_share",
    spark=_q54,
    oracle=f"""
SELECT year(o_orderdate) AS o_year,
       {dsum("CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
       / {dsum('l_extendedprice * (1 - l_discount)')} AS mkt_share
FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
  AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                      AND TIMESTAMP '1997-12-31 00:00:00'
  AND p_type = 'ECONOMY'
GROUP BY 1
""",
)


# --- q55: TPC-H Q10 returned items ---------------------------------------
# Scale: quarter filter prunes orders before the lineitem join;
# customer/nation broadcast; top-20 is TakeOrderedAndProject.
def _q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _read(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.expr(dsum("l_extendedprice * (1 - l_discount)")).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_q(
    "q55_tpch_q10_returned_items",
    spark=_q55,
    oracle=f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)


# --- q56: TPC-H Q14 promo revenue ----------------------------------------
# Scale: month filter first, part broadcast; one aggregation pass
# carries both the CASE numerator and the denominator.
def _q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _read(spark, sf_dir, "lineitem", "part")
    vol = "l_extendedprice * (1 - l_discount)"
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
        )
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.expr(
                    dsum(f"CASE WHEN p_type LIKE 'PROMO%' THEN {vol} ELSE 0 END")
                )
                / F.expr(dsum(vol))
            ).alias("promo_revenue")
        )
    )


_q(
    "q56_tpch_q14_promo_revenue",
    spark=_q56,
    oracle=f"""
SELECT 100.0 * {dsum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
       / {dsum('l_extendedprice * (1 - l_discount)')} AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
""",
)


# --- q57: TPC-H Q15 top supplier -----------------------------------------
# Scale: the revenue CTE aggregates once; the max is a 1-row broadcast
# cross join (never a driver collect), supplier dim broadcast. The
# DOUBLE equality is safe because both sides derive from the SAME
# exact decimal sums (bit-identical by construction).
def _q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _read(spark, sf_dir, "lineitem", "supplier")
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.expr(dsum("l_extendedprice * (1 - l_discount)")).alias("total_revenue")
        )
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(t["supplier"]), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


_q(
    "q57_tpch_q15_top_supplier",
    spark=_q57,
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)


# --- q58: TPC-H Q18 large-volume customers ------------------------------
# Scale: the HAVING subquery is a semi-join against an aggregated
# lineitem (one shuffle on orderkey, reused by the outer join under
# AQE); exact decimal quantity sums keep the threshold cut
# deterministic.
def _q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _read(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.expr(dsum("l_quantity")).alias("oq"))
        .filter(F.col("oq") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        t["lineitem"]
        .join(big, F.col("l_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
        )
        .agg(F.expr(dsum("l_quantity")).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


_q(
    "q58_tpch_q18_large_volume",
    spark=_q58,
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
       {dsum('l_quantity')} AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING {dsum('l_quantity')} > 250)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, order_date, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""",
)


# --- q59: TPC-H Q19 disjunctive band predicates --------------------------
# (adapted: fixture part has no container, lineitem no shipmode — the
# brand/size/quantity bands keep the OR-of-ANDs join-predicate shape.)
# Scale: Catalyst extracts the common p_partkey = l_partkey equality
# as the join key; the disjunction stays a post-join filter over
# broadcast part columns.
def _q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _read(spark, sf_dir, "lineitem", "part")
    band = (
        lambda brand, size_hi, q_lo, q_hi: (
            (F.col("p_brand") == brand)
            & (F.col("p_size").between(1, size_hi))
            & (F.col("l_quantity").between(q_lo, q_hi))
        )
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            band("Brand#12", 5, 1, 11)
            | band("Brand#23", 10, 10, 20)
            | band("Brand#34", 15, 20, 30)
        )
        .agg(
            F.expr(dsum("l_extendedprice * (1 - l_discount)")).alias("revenue")
        )
    )


_q(
    "q59_tpch_q19_disjunctive_bands",
    spark=_q59,
    oracle=f"""
SELECT {dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem, part
WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
       AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_partkey = l_partkey AND p_brand = 'Brand#23'
       AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_partkey = l_partkey AND p_brand = 'Brand#34'
       AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""",
)


# --- q60: TPC-H Q21 waiting suppliers ------------------------------------
# (adapted: no commit/receipt dates in the fixture — "late" is a
# shipdate cutoff; the EXISTS/NOT-EXISTS self-join shape is intact.)
# Scale: the two self-joins are semi/anti on l_orderkey with the
# supplier inequality as residual — both shuffle on the SAME key as
# the orders join, so AQE reuses one exchange; dims broadcast.
_Q21_LATE = "1999-06-01"


def _q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _read(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
    li = t["lineitem"]
    late = li.filter(F.col("l_shipdate") > F.lit(_Q21_LATE).cast("timestamp"))
    other = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    return (
        late.join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            other,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


_q(
    "q60_tpch_q21_waiting_suppliers",
    spark=_q60,
    oracle=f"""
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > TIMESTAMP '{_Q21_LATE} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > TIMESTAMP '{_Q21_LATE} 00:00:00')
  AND s_nationkey = n_nationkey
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
""",
)


# --- q61: TPC-H Q22 global sales opportunity ------------------------------
# (adapted: fixture customer has no phone — the country code is
# n_nationkey mod 10; the scalar-avg + NOT EXISTS shape is intact.)
# Scale: the average is a 1-row broadcast cross join; the anti-join
# shuffles on custkey; both engines compute the SAME exact decimal
# average, so the > cut is deterministic.
def _q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _read(spark, sf_dir, "customer", "orders")
    codes = [1, 3, 5, 7]
    sel = t["customer"].filter((F.col("c_nationkey") % 10).isin(codes))
    avg_bal = sel.filter(F.col("c_acctbal") > 0).agg(
        F.expr(davg("c_acctbal")).alias("avg_bal")
    )
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
    )
    return (
        sel.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            recent.select(F.col("o_custkey").alias("r_custkey")),
            F.col("c_custkey") == F.col("r_custkey"),
            "left_anti",
        )
        .withColumn("cntrycode", (F.col("c_nationkey") % 10).cast("string"))
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.expr(dsum("c_acctbal")).alias("totacctbal"),
        )
    )


_q(
    "q61_tpch_q22_global_sales",
    spark=_q61,
    oracle=f"""
SELECT CAST(c_nationkey % 10 AS VARCHAR) AS cntrycode,
       COUNT(*) AS numcust,
       {dsum('c_acctbal')} AS totacctbal
FROM customer
WHERE c_nationkey % 10 IN (1, 3, 5, 7)
  AND c_acctbal > (SELECT {davg('c_acctbal')} FROM customer
                   WHERE c_acctbal > 0 AND c_nationkey % 10 IN (1, 3, 5, 7))
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
GROUP BY cntrycode
""",
)


# --- round 12: the last five TPC-H shapes (Q2/Q9/Q11/Q16/Q20) ----------
# These need a partsupp table the fixture doesn't ship. Each query
# derives the SAME surrogate in both engines: the DISTINCT
# (l_partkey, l_suppkey) pairs carrying arithmetic ps_availqty /
# ps_supplycost computed from the keys. All-integer arithmetic until a
# single exactly-representable division by 100.0, so Spark and DuckDB
# materialize bit-identical doubles and every threshold / MIN-equality
# cut lands on the same rows. (The reference would run the genuine
# TPC-H through DataFusion — csvb_engine/src/lib.rs:88; the shapes are
# what is under test, per the q53 header note.)


def _partsupp(li: DataFrame) -> DataFrame:
    """Derived partsupp surrogate: one row per distinct part/supplier
    pair in lineitem, availqty in 1..9999, supplycost in 100.00..999.99.

    Scale: the DISTINCT is one shuffle on the composite key at the
    partsupp grain (TPC-H partsupp is 4x part — far smaller than
    lineitem); with a real partsupp table every consumer below would
    just scan it instead."""
    return li.select("l_partkey", "l_suppkey").distinct().select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
        ((F.col("l_partkey") * 7 + F.col("l_suppkey") * 13) % 9999 + 1)
        .cast("int")
        .alias("ps_availqty"),
        (
            ((F.col("l_partkey") * 31 + F.col("l_suppkey") * 17) % 90000 + 10000)
            .cast("double")
            / F.lit(100.0)
        ).alias("ps_supplycost"),
    )


# DuckDB twin of _partsupp — kept textually adjacent so a drift in one
# is visible in the diff of the other.
_PS_CTE = """
partsupp AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         CAST((l_partkey * 7 + l_suppkey * 13) % 9999 + 1 AS INTEGER) AS ps_availqty,
         CAST((l_partkey * 31 + l_suppkey * 17) % 90000 + 10000 AS DOUBLE) / 100.0
           AS ps_supplycost
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
)
"""


# --- q62: TPC-H Q2 minimum-cost supplier --------------------------------
# (adapted: fixture part has no mfgr/comment and supplier no address —
# the correlated-MIN + 4-dim join shape is intact.)
# Scale: region-filtered supplier dim broadcasts; the per-part MIN is
# a window over ONE shuffle on ps_partkey (no second self-join); the
# part filter semi-prunes partsupp BEFORE the shuffle — legal because
# the MIN is per-part, so dropping whole parts early cannot change it.
def _q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _read(spark, sf_dir, "part", "lineitem", "supplier", "nation", "region")
    eur = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    sel_part = t["part"].filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    )
    w = W.partitionBy("ps_partkey")
    return (
        _partsupp(t["lineitem"])
        .join(F.broadcast(eur), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(sel_part.select("p_partkey", "p_type")),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost")
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(100)
    )


_q(
    "q62_tpch_q2_min_cost_supplier",
    spark=_q62,
    oracle=f"""
WITH {_PS_CTE}
SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
FROM part, supplier, partsupp, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT MIN(ps2.ps_supplycost)
    FROM partsupp ps2, supplier s2, nation n2, region r2
    WHERE ps2.ps_partkey = part.p_partkey AND s2.s_suppkey = ps2.ps_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
""",
)


# --- q63: TPC-H Q9 product-type profit ----------------------------------
# Scale: the part filter broadcast-prunes BOTH lineitem and the
# partsupp surrogate before the composite-key shuffle join; supplier/
# nation broadcast; profit aggregates in one exact-decimal pass.
def _q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _read(spark, sf_dir, "part", "supplier", "lineitem", "orders", "nation")
    red = t["part"].filter(F.col("p_name").like("%red%")).select("p_partkey")
    ps = (
        _partsupp(t["lineitem"])
        .join(F.broadcast(red), F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .select("ps_partkey", "ps_suppkey", "ps_supplycost")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("ps_supplycost") * F.col("l_quantity")
            ).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.expr(dsum("amount")).alias("sum_profit"))
    )


_q(
    "q63_tpch_q9_product_profit",
    spark=_q63,
    oracle=f"""
WITH {_PS_CTE}
SELECT nation, o_year, {dsum('amount')} AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity AS amount
  FROM part, supplier, lineitem, partsupp, orders, nation
  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
    AND ps_partkey = l_partkey AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
""",
)


# --- q64: TPC-H Q11 important stock --------------------------------------
# Scale: the nation's supplier keys broadcast; group sums and the
# global threshold come from the SAME exact-decimal aggregation input
# (one shuffle on ps_partkey + a 1-row broadcast), so the > cut is
# deterministic cross-engine.
def _q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _read(spark, sf_dir, "lineitem", "supplier", "nation")
    nat_supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_19")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    ps_n = _partsupp(t["lineitem"]).join(
        F.broadcast(nat_supp), F.col("ps_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    val = ps_n.groupBy("ps_partkey").agg(
        F.expr(dsum("ps_supplycost * ps_availqty")).alias("value")
    )
    thresh = ps_n.agg(
        (F.expr(dsum("ps_supplycost * ps_availqty")) * F.lit(0.001)).alias("thresh")
    )
    return (
        val.join(F.broadcast(thresh))
        .filter(F.col("value") > F.col("thresh"))
        .select("ps_partkey", "value")
        .orderBy(F.desc("value"), F.asc("ps_partkey"))
    )


_q(
    "q64_tpch_q11_important_stock",
    spark=_q64,
    oracle=f"""
WITH {_PS_CTE}
SELECT ps_partkey, {dsum('ps_supplycost * ps_availqty')} AS value
FROM partsupp, supplier, nation
WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_name = 'NATION_19'
GROUP BY ps_partkey
HAVING {dsum('ps_supplycost * ps_availqty')} > (
  SELECT {dsum('ps_supplycost * ps_availqty')} * 0.001
  FROM partsupp, supplier, nation
  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name = 'NATION_19')
ORDER BY value DESC, ps_partkey ASC
""",
)


# --- q65: TPC-H Q16 parts/supplier relationship ---------------------------
# (adapted: supplier has no comment column — the "complaints" exclusion
# keys on negative account balance; the NOT-IN + COUNT(DISTINCT) shape
# is intact.)
# Scale: the exclusion list and the part dim both broadcast; the
# COUNT(DISTINCT) is a two-phase agg on (brand, type, size) — no
# per-group row explosion.
def _q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _read(spark, sf_dir, "lineitem", "part", "supplier")
    bad = (
        t["supplier"]
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_key"))
    )
    sel_part = t["part"].filter(
        (F.col("p_brand") != "Brand#12")
        & ~F.col("p_type").like("MED%")
        & F.col("p_size").isin(1, 5, 15, 25, 35, 45, 49, 50)
    )
    return (
        _partsupp(t["lineitem"])
        .join(F.broadcast(bad), F.col("ps_suppkey") == F.col("bad_key"), "left_anti")
        .join(
            F.broadcast(sel_part.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


_q(
    "q65_tpch_q16_supplier_relation",
    spark=_q65,
    oracle=f"""
WITH {_PS_CTE}
SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp, part
WHERE p_partkey = ps_partkey
  AND p_brand <> 'Brand#12'
  AND p_type NOT LIKE 'MED%'
  AND p_size IN (1, 5, 15, 25, 35, 45, 49, 50)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
""",
)


# --- q66: TPC-H Q20 potential part promotion ------------------------------
# Scale: red-part keys broadcast-prune partsupp AND the year's
# lineitem before its (partkey, suppkey) half-quantity agg; the
# correlated ">" is an equi-join against that agg (NULL-sum groups
# drop exactly like the SQL's NULL comparison); suppliers reduce by
# two broadcast-semi hops — no full-table shuffle anywhere.
def _q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _read(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    red = t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg((F.expr(dsum("l_quantity")) * F.lit(0.5)).alias("half_qty"))
    )
    cand = (
        _partsupp(t["lineitem"])
        .join(F.broadcast(red), F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(cand, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_18")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
        .orderBy(F.asc("s_name"))
    )


_q(
    "q66_tpch_q20_part_promotion",
    spark=_q66,
    oracle=f"""
WITH {_PS_CTE}
SELECT s_suppkey, s_name
FROM supplier, nation
WHERE s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND ps_availqty > (
        SELECT 0.5 * {dsum('l_quantity')}
        FROM lineitem
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'))
  AND s_nationkey = n_nationkey AND n_name = 'NATION_18'
ORDER BY s_name ASC
""",
)
