"""Privacy / re-identification-risk query suite — the compliance pass a
training-data pipeline runs before records leave the curation boundary
(the PII-redaction twin at the RECORD level rather than the text
level; see operators/text.py for the in-text redaction pass).

Three classic, fully deterministic measures over the customer roster:

- **k-anonymity**: group sizes over a quasi-identifier tuple; groups
  below the k threshold are flagged for suppression.
- **l-diversity**: within each quasi-identifier group, the diversity of
  a SENSITIVE attribute (order priority via the orders join) — a
  k-anonymous group is still unsafe if everyone in it shares the
  sensitive value.
- **generalization ladder**: per segment, the smallest account-balance
  band width whose coarsening makes EVERY group k-anonymous — the
  adaptive-generalization decision, chosen from a fixed width ladder.

All three are grouped aggregations (one shuffle each, partial-agg
absorbed map-side) — the measures stay cheap at any corpus size, which
is exactly why they run as a standing gate. Full DuckDB value oracles;
counts are exact integers, band edges are floor() on the same grid in
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .base import QuerySpec, t

K_MIN = 10  # k-anonymity release threshold
L_MIN = 3  # l-diversity threshold on the sensitive attribute
LADDER_K = 20  # every band must reach this k on the chosen width
BAND_WIDTHS = (500, 1000, 2500, 5000, 10000)  # generalization ladder
LDIV_BAND = 2500  # acctbal band width for the l-diversity QI


def q_privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-size census over the (nation, market segment)
    quasi-identifier: k per group plus the suppression verdict."""
    cust = t(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("k"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "k",
            (col("k") < K_MIN).cast("int").alias("suppress"),
        )
    )


_K_ANON_SQL = f"""
SELECT c_nationkey, c_mktsegment, count(*) AS k,
       CASE WHEN count(*) < {K_MIN} THEN 1 ELSE 0 END AS suppress
FROM customer
GROUP BY c_nationkey, c_mktsegment
"""


def q_privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensitive-attribute diversity per quasi-identifier group: the
    number of DISTINCT order priorities observed for each
    (nation, segment, acctbal band) group's members. A group below the
    l threshold leaks its members' priority even when k-anonymous."""
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(col("c_acctbal") / LDIV_BAND).cast("long").alias("bal_band"),
    )
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(
            F.countDistinct("o_orderpriority").alias("l"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_band",
            "l",
            "n_orders",
            (col("l") < L_MIN).cast("int").alias("leaky"),
        )
    )


_L_DIV_SQL = f"""
SELECT c_nationkey, c_mktsegment,
       CAST(floor(c_acctbal / {LDIV_BAND}) AS BIGINT) AS bal_band,
       count(DISTINCT o_orderpriority) AS l,
       count(*) AS n_orders,
       CASE WHEN count(DISTINCT o_orderpriority) < {L_MIN} THEN 1 ELSE 0 END AS leaky
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2, 3
"""


def q_privacy_generalize_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive generalization: for each market segment, the SMALLEST
    account-balance band width (from the fixed ladder) under which
    every band reaches LADDER_K members — widest width as the fallback
    when none qualifies. One explode over a constant 5-element ladder,
    two grouped aggregations, a WindowGroupLimit pick: segment-count
    work, corpus-size-independent after the first scan."""
    cust = t(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")
    widths = F.array(*[F.lit(w) for w in BAND_WIDTHS])
    banded = cust.select(
        "c_mktsegment",
        F.explode(widths).alias("w"),
        "c_acctbal",
    ).select(
        "c_mktsegment",
        "w",
        F.floor(col("c_acctbal") / col("w")).cast("long").alias("band"),
    )
    min_k = (
        banded.groupBy("c_mktsegment", "w", "band")
        .agg(F.count(F.lit(1)).alias("k"))
        .groupBy("c_mktsegment", "w")
        .agg(F.min("k").alias("min_k"))
    )
    # smallest qualifying width; widest as fallback → rank qualifying
    # widths ascending, non-qualifying by descending width behind them.
    rk = Window.partitionBy("c_mktsegment").orderBy(
        (col("min_k") >= LADDER_K).cast("int").desc(),
        F.when(col("min_k") >= LADDER_K, col("w")).otherwise(-col("w")),
    )
    return (
        min_k.withColumn("rk", F.row_number().over(rk))
        .filter(col("rk") == 1)
        .select(
            "c_mktsegment",
            col("w").alias("chosen_width"),
            "min_k",
            (col("min_k") >= LADDER_K).cast("int").alias("qualified"),
        )
    )


_LADDER_SQL = f"""
WITH widths(w) AS (VALUES {', '.join(f'({w})' for w in BAND_WIDTHS)}),
banded AS (
    SELECT c_mktsegment, w,
           CAST(floor(c_acctbal / w) AS BIGINT) AS band
    FROM customer CROSS JOIN widths
),
per_band AS (
    SELECT c_mktsegment, w, band, count(*) AS k
    FROM banded GROUP BY 1, 2, 3
),
min_k AS (
    SELECT c_mktsegment, w, min(k) AS min_k FROM per_band GROUP BY 1, 2
),
ranked AS (
    SELECT c_mktsegment, w, min_k,
           row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY CASE WHEN min_k >= {LADDER_K} THEN 1 ELSE 0 END DESC,
                        CASE WHEN min_k >= {LADDER_K} THEN w ELSE -w END
           ) AS rk
    FROM min_k
)
SELECT c_mktsegment, w AS chosen_width, min_k,
       CASE WHEN min_k >= {LADDER_K} THEN 1 ELSE 0 END AS qualified
FROM ranked WHERE rk = 1
"""


QUERIES: dict[str, QuerySpec] = {}

LOCAL_QUERIES: dict[str, QuerySpec] = {
    "privacy_k_anonymity": QuerySpec(q_privacy_k_anonymity, _K_ANON_SQL),
    "privacy_l_diversity": QuerySpec(q_privacy_l_diversity, _L_DIV_SQL),
    "privacy_generalize_ladder": QuerySpec(
        q_privacy_generalize_ladder, _LADDER_SQL
    ),
}
