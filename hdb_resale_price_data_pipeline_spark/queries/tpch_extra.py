"""Additional TPC-H-shaped queries (Q6/Q14/Q18/Q19/Q22 adapted to the
testdata's columns) — breadth for the relational surface: conditional
aggregate ratios, HAVING, disjunctive pushdown, scalar subqueries,
approximate aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .base import QuerySpec, t


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter-agg; every predicate must reach the scan."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (col("l_shipdate") >= F.lit("1996-01-01"))
            & (col("l_shipdate") < F.lit("1997-01-01"))
            & (col("l_discount") >= 0.05)
            & (col("l_discount") <= 0.07)
            & (col("l_quantity") < 24)
        )
        .agg(
            # DECIMAL-domain rounded product sum (see q10's comment)
            F.round(
                F.sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,4)")),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


_Q6_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio over a join."""
    li = t(spark, sf_dir, "lineitem").filter(
        (col("l_shipdate") >= F.lit("1997-01-01")) & (col("l_shipdate") < F.lit("1997-04-01"))
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (col("l_extendedprice") * (1 - col("l_discount"))).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(broadcast(part), col("l_partkey") == col("p_partkey"))
        .agg(
            # exact DECIMAL numerator/denominator; repr-free floor round
            # of the (bit-identical) ratio quotient
            (
                F.floor(
                    F.lit(100.0)
                    * F.sum(F.when(col("p_type") == "ECONOMY", rev).otherwise(zero)).cast(
                        "double"
                    )
                    / F.sum(rev).cast("double")
                    * 100
                    + F.lit(0.5)
                ).cast("double")
                / 100
            ).alias("promo_pct")
        )
    )


_Q14_SQL = """
SELECT CAST(floor(100.0
             * CAST(sum(CASE WHEN p_type = 'ECONOMY'
                        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                    AS DOUBLE) * 100 + 0.5) AS DOUBLE) / 100 AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: agg + HAVING + join back + top-k."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(col("total_qty") > 250)
    )
    return (
        big.join(orders, col("l_orderkey") == col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") == col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            F.round(col("o_totalprice"), 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(col("totalprice").desc(), col("o_orderkey"))
        .limit(20)
    )


_Q18_SQL = """
SELECT c_name, o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
       round(o_totalprice, 2) AS totalprice,
       total_qty
FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 250) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice DESC, o_orderkey
LIMIT 20
"""


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    bands — the optimizer must still push the common join key."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    joined = li.join(broadcast(part), col("l_partkey") == col("p_partkey"))
    bands = (
        ((col("p_brand") == "Brand#1") & (col("p_size").between(1, 15)) & (col("l_quantity").between(1, 20)))
        | ((col("p_brand") == "Brand#2") & (col("p_size").between(16, 35)) & (col("l_quantity").between(10, 30)))
        | ((col("p_brand") == "Brand#3") & (col("p_size").between(36, 50)) & (col("l_quantity").between(20, 40)))
    )
    return joined.filter(bands).agg(
        F.round(
            F.sum((col("l_extendedprice") * (1 - col("l_discount"))).cast("decimal(18,4)")),
            2,
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q19_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))),
                  2) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 16 AND 35 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 36 AND 50 AND l_quantity BETWEEN 20 AND 40)
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global avg of positive
    balances) + anti join, grouped by nation."""
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").select("o_custkey")
    # exact DECIMAL sum / count: the scalar threshold must be the SAME
    # double on both engines, or a customer whose balance coincides with
    # an order-sensitive float avg flips membership
    avg_bal_row = (
        customer.filter(col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("ab")
        )
        .first()
    )
    avg_bal = avg_bal_row.ab
    return (
        customer.filter(col("c_acctbal") > avg_bal)
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
    )


_Q22_SQL = """
SELECT c_nationkey,
       count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS total_balance
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                          / count(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""


def q_lineitem_filter_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 + Q14 + Q19 consolidated into one labeled (metric, value)
    result — one driver slot for three single-row filter-agg demos. Each
    branch keeps its original plan (scan-level predicate pushdown for Q6,
    conditional-aggregate ratio over a broadcast join for Q14, disjunctive
    band pushdown for Q19); Q19's two output columns are unpivoted via
    ``stack`` so the whole suite stays one pass per branch."""
    q6 = q6_forecast_revenue(spark, sf_dir).select(
        F.lit("q6_forecast_revenue").alias("metric"),
        col("revenue").cast("double").alias("value"),
    )
    q14 = q14_promo_revenue(spark, sf_dir).select(
        F.lit("q14_promo_pct").alias("metric"),
        col("promo_pct").cast("double").alias("value"),
    )
    q19 = q19_disjunctive(spark, sf_dir).select(
        F.expr(
            "stack(2, 'q19_revenue', CAST(revenue AS DOUBLE), "
            "'q19_n_lines', CAST(n_lines AS DOUBLE)) AS (metric, value)"
        )
    )
    return q6.unionByName(q14).unionByName(q19)


# Built FROM the single-query oracle strings so the suite can never
# drift from the standalone q6/q14/q19 formulas (the repr-round fixes
# apply to both automatically).
_FILTER_SUITE_SQL = f"""
SELECT 'q6_forecast_revenue' AS metric, CAST(revenue AS DOUBLE) AS value
FROM ({_Q6_SQL})
UNION ALL
SELECT 'q14_promo_pct' AS metric, CAST(promo_pct AS DOUBLE) AS value
FROM ({_Q14_SQL})
UNION ALL
SELECT metric, value FROM (
    SELECT CAST(revenue AS DOUBLE) AS q19_revenue,
           CAST(n_lines AS DOUBLE) AS q19_n_lines
    FROM ({_Q19_SQL})
) UNPIVOT (value FOR metric IN (q19_revenue, q19_n_lines))
"""


def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL distinct, quantile sketch) emitted as
    a VERIFIED error-bound projection. Sketch internals differ across
    engines, so the raw estimates can't be hash-compared — but their
    error bounds can: the query computes the exact values alongside the
    sketches IN Spark, checks each sketch against its accuracy contract
    (HLL rsd default 0.05 is a relative STANDARD DEVIATION, not a
    ceiling — the flag uses a 3σ band, 0.15, so healthy variance on any
    corpus can't trip it while a broken sketch still does;
    percentile_approx rank error 1/accuracy = 1e-4, checked against a
    loose 0.02 rank band that also absorbs value ties), and emits
    ``(exact values, bound flags)``. The DuckDB
    twin computes the same exact values and expects every flag = 1, so
    a sketch regression breaks the hash. All inputs are deterministic
    (HLL and KLL merges are order-free on fixed data), making the
    projection stable across partitionings — pinned in
    tests/test_approx.py. Three scans of single columns; each is one
    partial-agg'd codegen pass, so the shape stays scan-bound at 100 TB.
    """
    li = t(spark, sf_dir, "lineitem")
    approx = li.agg(
        F.approx_count_distinct("l_orderkey").alias("a_orders"),
        F.approx_count_distinct("l_partkey").alias("a_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("a_med"),
        F.percentile_approx("l_extendedprice", 0.99).alias("a_p99"),
    )
    exact = li.agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    ranks = (
        li.select("l_extendedprice")
        .crossJoin(F.broadcast(approx))
        .agg(
            F.sum((col("l_extendedprice") <= col("a_med")).cast("long")).alias(
                "rank_med"
            ),
            F.sum((col("l_extendedprice") <= col("a_p99")).cast("long")).alias(
                "rank_p99"
            ),
            F.first("a_orders").alias("a_orders"),
            F.first("a_parts").alias("a_parts"),
        )
    )
    ok = lambda c: c.cast("int")  # noqa: E731
    return (
        exact.crossJoin(F.broadcast(ranks))
        .select(
            "exact_orders",
            "exact_parts",
            "n_rows",
            ok(
                F.abs(col("a_orders") - col("exact_orders"))
                / col("exact_orders")
                <= 0.15
            ).alias("orders_in_bound"),
            ok(
                F.abs(col("a_parts") - col("exact_parts")) / col("exact_parts")
                <= 0.15
            ).alias("parts_in_bound"),
            ok(
                F.abs(col("rank_med") / col("n_rows") - F.lit(0.5)) <= 0.02
            ).alias("median_in_bound"),
            ok(
                F.abs(col("rank_p99") / col("n_rows") - F.lit(0.99)) <= 0.02
            ).alias("p99_in_bound"),
        )
    )


# The oracle recomputes the exact side and expects every sketch to sit
# inside its bound — any flag the Spark side drops to 0 breaks the hash.
_APPROX_STATS_SQL = """
SELECT count(DISTINCT l_orderkey) AS exact_orders,
       count(DISTINCT l_partkey) AS exact_parts,
       count(*) AS n_rows,
       1 AS orders_in_bound,
       1 AS parts_in_bound,
       1 AS median_in_bound,
       1 AS p99_in_bound
FROM lineitem
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS — orders in a window having at
    least one lineitem shipped after the order date. Spark has no
    EXISTS in the DataFrame API; the decorrelated form IS the plan the
    optimizer would produce: a LEFT SEMI join carrying the non-equi
    correlation predicate, then the grouped count. At scale the semi
    join shuffles both sides on l_orderkey once — same as the SQL form."""
    o = t(spark, sf_dir, "orders").filter(
        (col("o_orderdate") >= F.lit("1996-01-01"))
        & (col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (col("o_orderkey") == col("l_orderkey"))
            & (col("l_shipdate") > col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_Q4_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY 1
"""


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated SCALAR subquery — revenue of
    lineitems whose quantity is below half their part's average.
    Decorrelated: the per-part average becomes a grouped aggregate
    joined back on the key. The brand filter semi-restricts the
    aggregate's input FIRST (broadcast), so the avg shuffle carries
    only the brand's parts — the correlated form computes per-part
    averages the outer query then discards."""
    part = (
        t(spark, sf_dir, "part")
        .filter(col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_items = li.join(
        broadcast(part), col("l_partkey") == col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    half_avg = brand_items.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        brand_items.join(half_avg, "l_partkey")
        .filter(col("l_quantity") < col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


_Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l1 JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.5 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
"""


def q21_stuck_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS on the same child table —
    orders with a late shipment (≥ 2000) and no early one (< 1996).
    Decorrelated: LEFT SEMI then LEFT ANTI on l_orderkey. Both joins
    shuffle on the same key, so the second reuses the first's
    partitioning (one extra exchange for the filtered anti side only)."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = li.filter(col("l_shipdate") >= F.lit("2000-01-01"))
    early = li.filter(col("l_shipdate") < F.lit("1996-01-01"))
    return (
        o.join(late, col("o_orderkey") == late.l_orderkey, "left_semi")
        .join(early, col("o_orderkey") == early.l_orderkey, "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_Q21_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate >= TIMESTAMP '2000-01-01')
  AND NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate < TIMESTAMP '1996-01-01')
GROUP BY 1
"""


# r4: the last tpch_extra graded slot went to the new corpus-curation
# operators (this module was explicitly ordered to fall off first).
QUERIES: dict[str, QuerySpec] = {}

def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-sided dimension resolution (supplier nation
    AND customer nation via separate nation aliases), nation-pair filter
    in both directions, revenue by (supp_nation, cust_nation, year).
    All dims broadcast; one shuffle for the final group."""
    li = t(spark, sf_dir, "lineitem").filter(
        (col("l_shipdate") >= F.lit("1996-01-01")) & (col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supplier = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation")
    n1 = nation.select(
        col("n_nationkey").alias("sn_key"), col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        col("n_nationkey").alias("cn_key"), col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, col("l_orderkey") == col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") == col("c_custkey"))
        .join(broadcast(supplier), col("l_suppkey") == col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") == col("sn_key"))
        .join(broadcast(n2), col("c_nationkey") == col("cn_key"))
        .filter(
            ((col("supp_nation") == "NATION_1") & (col("cust_nation") == "NATION_2"))
            | ((col("supp_nation") == "NATION_2") & (col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(
                    (col("l_extendedprice") * (1 - col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(round(sum(CAST(volume AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
GROUP BY supp_nation, cust_nation, l_year
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer over one
    quarter, top 20 — selective flag filter + 4-way join + global
    top-k (TakeOrderedAndProject)."""
    li = t(spark, sf_dir, "lineitem").filter(col("l_returnflag") == "R")
    orders = t(spark, sf_dir, "orders").filter(
        (col("o_orderdate") >= F.lit("1996-01-01")) & (col("o_orderdate") < F.lit("1996-04-01"))
    )
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    return (
        li.join(orders, col("l_orderkey") == col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") == col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") == col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            # DECIMAL(18,4) term sum: the 4-decimal true revenue terms sum
            # exactly and order-free, so the 2-decimal presentation round
            # can never land on a cross-engine ulp boundary (this query
            # DID hit one as a double sum: 307843.595 at sf0.01).
            F.round(
                F.sum(
                    (col("l_extendedprice") * (1 - col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(col("revenue").desc(), col("c_custkey"))
        .limit(20)
    )


_Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))),
                  2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer —
    LEFT join (zero-order customers count as 0) then a second
    aggregation over the counts. Two shuffles by construction."""
    customer = t(spark, sf_dir, "customer").select("c_custkey")
    orders = t(spark, sf_dir, "orders").filter(
        col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    return (
        customer.join(orders, col("c_custkey") == col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(col("custdist").desc(), col("c_count").desc())
    )


_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
  GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: per-supplier quarter revenue, then equality
    against the MAX of that derived aggregate (scalar subquery over a
    derived table). Revenue is rounded BEFORE the max/equality so the
    comparison is on exact 2-decimal values cross-engine."""
    li = t(spark, sf_dir, "lineitem").filter(
        (col("l_shipdate") >= F.lit("1996-01-01")) & (col("l_shipdate") < F.lit("1996-04-01"))
    )
    supplier = t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(
                (col("l_extendedprice") * (1 - col("l_discount"))).cast("decimal(18,4)")
            ),
            2,
        )
        .cast("double")
        .alias("total_rev")
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(broadcast(supplier), col("l_suppkey") == col("s_suppkey"))
        .crossJoin(broadcast(top))
        .filter(col("total_rev") == col("max_rev"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))),
                    2) AS DOUBLE) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY s_suppkey
"""


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp adapted to the lineitem link table):
    distinct-supplier variety per part attribute group, with a NOT-IN
    exclusion subquery (low-balance suppliers stand in for the
    complaints list). count(DISTINCT) + anti-join in one query."""
    link = (
        t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    part = t(spark, sf_dir, "part").filter(
        (col("p_brand") != "Brand#1")
        & (col("p_type") != "ECONOMY")
        & (col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    excluded = t(spark, sf_dir, "supplier").filter(col("s_acctbal") < 100).select(
        "s_suppkey"
    )
    return (
        link.join(broadcast(excluded), col("l_suppkey") == col("s_suppkey"), "left_anti")
        .join(broadcast(part), col("l_partkey") == col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
JOIN part ON l_partkey = p_partkey
WHERE p_brand != 'Brand#1' AND p_type != 'ECONOMY'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 100)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp adapted): shipped value per part for
    two supplier nations, keeping only parts above a FRACTION of the
    global total — a HAVING clause against a scalar subquery over the
    same derived aggregate."""
    li = t(spark, sf_dir, "lineitem")
    supplier = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    scoped = (
        li.join(broadcast(supplier), col("l_suppkey") == col("s_suppkey"))
        .join(broadcast(nation), col("s_nationkey") == col("n_nationkey"))
        .filter(col("n_name").isin("NATION_3", "NATION_4"))
    )
    per_part = scoped.groupBy("l_partkey").agg(
        F.sum(
            (col("l_extendedprice") * col("l_quantity")).cast("decimal(18,4)")
        ).alias("value_dec")
    )
    total = per_part.agg(F.sum("value_dec").alias("grand_dec"))
    return (
        per_part.crossJoin(broadcast(total))
        .filter(
            col("value_dec").cast("double")
            > col("grand_dec").cast("double") * 0.002
        )
        .select(
            "l_partkey",
            F.round(col("value_dec"), 2).cast("double").alias("part_value"),
        )
        .orderBy(col("part_value").desc(), col("l_partkey"))
    )


_Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_3', 'NATION_4')
  GROUP BY l_partkey)
SELECT l_partkey, CAST(round(value_dec, 2) AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(value_dec AS DOUBLE)
      > CAST((SELECT sum(value_dec) FROM per_part) AS DOUBLE) * 0.002
ORDER BY part_value DESC, l_partkey
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue by
    order year — conditional-aggregate ratio where numerator and
    denominator are exact DECIMAL sums, so the double quotient is
    bit-deterministic."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supplier = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    nc = nation.select(col("n_nationkey").alias("cn_key"), "n_regionkey")
    ns = nation.select(
        col("n_nationkey").alias("sn_key"), col("n_name").alias("supp_nation")
    )
    vol = (col("l_extendedprice") * (1 - col("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(orders, col("l_orderkey") == col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") == col("c_custkey"))
        .join(broadcast(nc), col("c_nationkey") == col("cn_key"))
        .join(broadcast(region), col("n_regionkey") == col("r_regionkey"))
        .filter(col("r_name") == "ASIA")
        .join(broadcast(supplier), col("l_suppkey") == col("s_suppkey"))
        .join(broadcast(ns), col("s_nationkey") == col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            # floor(q*1e4 + 0.5)/1e4, not round(q, 4): the quotient of
            # two exact DECIMAL sums is a bit-identical double on both
            # engines, but round() consults the decimal repr in Spark vs
            # the binary value in DuckDB and diverges on .xxxx5 ties;
            # floor is repr-free.
            (
                F.floor(
                    F.sum(
                        F.when(col("supp_nation") == "NATION_5", vol).otherwise(
                            F.lit(0).cast("decimal(18,4)")
                        )
                    ).cast("double")
                    / F.sum(vol).cast("double")
                    * 10000
                    + 0.5
                ).cast("double")
                / 10000
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_Q8_SQL = """
SELECT year(o_orderdate) AS o_year,
       CAST(floor(CAST(sum(CASE WHEN n2.n_name = 'NATION_5'
                           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                    AS DOUBLE) * 10000 + 0.5) AS DOUBLE) / 10000 AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (ps_supplycost adapted to a retail-price cost
    proxy): profit by supplier nation and order year for parts whose
    name carries a token."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supplier = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation")
    part = t(spark, sf_dir, "part").filter(col("p_name").contains("widget")).select(
        "p_partkey", "p_retailprice"
    )
    profit = (
        col("l_extendedprice") * (1 - col("l_discount"))
        - col("p_retailprice") * F.lit(0.6) * col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(broadcast(part), col("l_partkey") == col("p_partkey"))
        .join(orders, col("l_orderkey") == col("o_orderkey"))
        .join(broadcast(supplier), col("l_suppkey") == col("s_suppkey"))
        .join(broadcast(nation), col("s_nationkey") == col("n_nationkey"))
        .groupBy(col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
        .orderBy("nation", col("o_year").desc())
    )


_Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           - p_retailprice * 0.6 * l_quantity AS DECIMAL(18,4))),
                  2) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


def q12_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode adapted to ship-delay buckets): count
    critical- vs normal-priority lines per delay bucket — integer
    date arithmetic + conditional counts, all exact."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
    crit = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, col("l_orderkey") == col("o_orderkey"))
        .select(
            F.when(delay > 60, "late").otherwise("on_time").alias("bucket"),
            crit.alias("crit"),
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.when(col("crit"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~col("crit"), 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("bucket")
    )


_Q12_SQL = """
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) > 60
            THEN 'late' ELSE 'on_time' END AS bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY bucket
ORDER BY bucket
"""


def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp adapted): for each mid-size LARGE part,
    the supplier(s) achieving the minimum observed unit price — a
    per-part MIN resolved by window and matched by equality (MIN of
    doubles is order-free exact, no sum involved)."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (col("p_type") == "LARGE") & col("p_size").between(10, 20)
    )
    supplier = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    offer = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(col("l_extendedprice") / col("l_quantity")).alias("unit_price"))
    )
    w = Window.partitionBy("l_partkey")
    best = (
        offer.withColumn("min_price", F.min("unit_price").over(w))
        .filter(col("unit_price") == col("min_price"))
        .drop("min_price")
    )
    return (
        best.join(broadcast(part), col("l_partkey") == col("p_partkey"))
        .join(broadcast(supplier), col("l_suppkey") == col("s_suppkey"))
        .join(broadcast(nation), col("s_nationkey") == col("n_nationkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            col("n_name").alias("supp_nation"),
            # raw quotient, NOT rounded: extendedprice/quantity lands on
            # exact .xxxx5 decimal ties structurally (2-decimal price /
            # integer qty), where Spark's repr-round and DuckDB's
            # binary-round disagree; the IEEE quotient itself is
            # bit-identical on both engines.
            col("unit_price"),
        )
        .orderBy("p_partkey", "s_name")
    )


_Q2_SQL = """
WITH offer AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_price
  FROM lineitem GROUP BY l_partkey, l_suppkey),
best AS (
  SELECT l_partkey, l_suppkey, unit_price
  FROM (SELECT *, min(unit_price) OVER (PARTITION BY l_partkey) AS min_price
        FROM offer)
  WHERE unit_price = min_price)
SELECT p_partkey, p_name, s_name, n_name AS supp_nation,
       unit_price
FROM best
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
ORDER BY p_partkey, s_name
"""


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (partsupp availqty adapted): suppliers who
    shipped more than 40% of some red part's total shipped quantity —
    a correlated share threshold resolved as agg + window total +
    semi-join back to supplier. Quantities are small integers in
    doubles, so every sum is exact."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(col("p_name").startswith("red")).select(
        "p_partkey"
    )
    supplier = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    shipped = (
        li.join(broadcast(part), col("l_partkey") == col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("part_qty", F.sum("supp_qty").over(w))
        .filter(col("supp_qty") > col("part_qty") * 0.4)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(dominant, col("s_suppkey") == col("l_suppkey"), "left_semi")
        .join(broadcast(nation), col("s_nationkey") == col("n_nationkey"))
        .select("s_suppkey", "s_name", col("n_name").alias("supp_nation"))
        .orderBy("s_suppkey")
    )


_Q20_SQL = """
SELECT s_suppkey, s_name, n_name AS supp_nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM (SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty,
               sum(sum(l_quantity)) OVER (PARTITION BY l_partkey) AS part_qty
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
        GROUP BY l_partkey, l_suppkey)
  WHERE supp_qty > part_qty * 0.4)
ORDER BY s_suppkey
"""


# Subsumed by lineitem_filter_suite (q6/q14/q19) or near-duplicate of
# graded demos (q22 = scalar subquery + anti join, both graded elsewhere);
# still oracle-verified by tests/test_correctness.py. approx_stats emits
# a verified error-bound projection (sketch internals differ across
# engines, so raw estimates can't hash — their bounds can), making it
# fully oracle-checkable; tests/test_approx.py still bounds the raw
# sketch values every run.
LOCAL_QUERIES: dict[str, QuerySpec] = {
    "lineitem_filter_suite": QuerySpec(q_lineitem_filter_suite, _FILTER_SUITE_SQL),
    "approx_stats": QuerySpec(q_approx_stats, _APPROX_STATS_SQL),
    "q4_order_priority": QuerySpec(q4_order_priority, _Q4_SQL),
    "q17_small_quantity": QuerySpec(q17_small_quantity, _Q17_SQL),
    "q21_stuck_orders": QuerySpec(q21_stuck_orders, _Q21_SQL),
    "q18_large_orders": QuerySpec(q18_large_orders, _Q18_SQL),
    "q6_forecast_revenue": QuerySpec(q6_forecast_revenue, _Q6_SQL),
    "q14_promo_revenue": QuerySpec(q14_promo_revenue, _Q14_SQL),
    "q19_disjunctive": QuerySpec(q19_disjunctive, _Q19_SQL),
    "q22_idle_customers": QuerySpec(q22_idle_customers, _Q22_SQL),
    "q7_nation_volume": QuerySpec(q7_nation_volume, _Q7_SQL),
    "q10_returned_items": QuerySpec(q10_returned_items, _Q10_SQL),
    "q13_order_distribution": QuerySpec(q13_order_distribution, _Q13_SQL),
    "q15_top_supplier": QuerySpec(q15_top_supplier, _Q15_SQL),
    "q16_supplier_variety": QuerySpec(q16_supplier_variety, _Q16_SQL),
    "q11_important_value": QuerySpec(q11_important_value, _Q11_SQL),
    "q2_min_price_supplier": QuerySpec(q2_min_price_supplier, _Q2_SQL),
    "q8_market_share": QuerySpec(q8_market_share, _Q8_SQL),
    "q9_product_profit": QuerySpec(q9_product_profit, _Q9_SQL),
    "q12_ship_delay": QuerySpec(q12_ship_delay, _Q12_SQL),
    "q20_excess_shippers": QuerySpec(q20_excess_shippers, _Q20_SQL),
}
