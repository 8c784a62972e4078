"""Domain-mixture sampling: deterministic per-source downsampling to an
equal-token budget per domain.

Training-data pipelines re-weight their source mix (web crawl vs books
vs code …) before training; the simplest reproducible scheme gives each
domain the same token budget and hash-samples documents at
``rate = min(1, (budget / n_domains) / domain_tokens)``. Hash-based
acceptance (fingerprint mod 10000 under a per-domain threshold) makes
the sample a pure function of the data — stable across runs, engines,
and re-shards, unlike ``df.sample``.

Scale design:

- Pass 1 aggregates per-domain token totals over a **2-column
  projection** of the corpus (domain, n_tok) — one partial-agg shuffle
  of a few bytes per row, never the text itself.
- The rate table is domains-sized (thousands at most), so the unbounded
  window that attaches ``n_domains`` runs on a single task over a tiny
  frame, and the rate table reaches pass 2 as a **broadcast** — the
  corpus is never shuffled for the join.
- Exactness across engines: rates avoid transcendentals and
  cross-domain float sums entirely. ``budget / (n_domains *
  domain_tokens)`` is one IEEE double division of exact integers,
  bit-identical in Spark and DuckDB, so the acceptance threshold can
  never flip between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from ..functions import hashing as H
from . import text as T

ACCEPT_MOD = 10_000  # acceptance-hash resolution (basis points)


def _doc_sampling_features(
    docs: DataFrame, domain_col: str, id_col: str, text_col: str
) -> DataFrame:
    return docs.select(
        col(id_col),
        col(domain_col),
        T.token_count(text_col).cast("bigint").alias("n_tok"),
        (T.fingerprint(text_col) % ACCEPT_MOD).alias("_fp"),
    )


def domain_rates(
    features: DataFrame, domain_col: str, budget_tokens: int
) -> DataFrame:
    """Per-domain acceptance rates for an equal-token-budget mixture.

    ``features`` must carry ``(domain_col, n_tok)``. The returned frame
    has one row per domain: ``(domain, domain_tokens, rate)``.
    """
    dom = features.groupBy(domain_col).agg(
        F.sum("n_tok").alias("domain_tokens")
    )
    # Zero-token domains (all-empty docs) are excluded BEFORE the rate
    # quotient in both engines: budget/0 is NULL in Spark but +inf →
    # rate 1.0 under DuckDB double division — a latent cross-engine
    # divergence on degenerate data (same guard as temperature_rates).
    # n_domains therefore counts domains with content, in both engines.
    dom = dom.filter(col("domain_tokens") > 0)
    # Unbounded window on the domains-sized agg output: single task, but
    # the frame is tiny by construction and this keeps one plan (a
    # crossJoin against a separate count(*) agg would re-scan the corpus).
    n_domains = F.count(F.lit(1)).over(Window.partitionBy())
    rate = F.least(
        F.lit(1.0),
        F.lit(float(budget_tokens))
        / (n_domains * col("domain_tokens")).cast("double"),
    )
    return dom.select(domain_col, "domain_tokens", rate.alias("rate"))


def sample_domain_mixture(
    docs: DataFrame,
    budget_tokens: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sampled corpus rows ``(id, domain, n_tok)`` for an equal-budget
    domain mixture of roughly ``budget_tokens`` total tokens."""
    features = _doc_sampling_features(docs, domain_col, id_col, text_col)
    rates = domain_rates(features, domain_col, budget_tokens)
    return (
        features.join(
            F.broadcast(rates.select(domain_col, "rate")), domain_col
        )
        .filter(col("_fp").cast("double") < col("rate") * float(ACCEPT_MOD))
        .select(id_col, domain_col, "n_tok")
    )


# Quantization grid for per-domain sqrt terms: summing FLOORED
# sqrt·2^20 values as BIGINTs makes the cross-domain total order-free
# exact (float sums depend on iteration order; integer sums don't) —
# the same grid trick the LM-perplexity and GD-classifier oracles use.
TEMP_SCALE = 1 << 20


def temperature_rates(
    features: DataFrame, domain_col: str, budget_tokens: int
) -> DataFrame:
    """Per-domain acceptance rates for a τ=0.5 TEMPERATURE mixture
    (multilingual-sampling style: sampled share ∝ (domain share)^τ —
    up-weights small domains relative to proportional sampling without
    flattening to uniform). τ=0.5 is the standard setting AND the one
    whose power is IEEE-exact cross-engine (sqrt is correctly rounded;
    an arbitrary ``pow`` is not), so the oracle stays bit-identical.

    ``budget_d = budget · √tokens_d / Σ_e √tokens_e``;
    ``rate_d = min(1, budget_d / tokens_d)``. The Σ runs over quantized
    BIGINT terms (order-free); the final rate is a fixed dag of double
    ops on exact integers, written identically in the DuckDB twin.
    """
    dom = features.groupBy(domain_col).agg(
        F.sum("n_tok").alias("domain_tokens")
    )
    # A domain whose every doc is empty/whitespace has domain_tokens=0:
    # its rate quotient is 0/0 — NULL in Spark but a different value
    # under DuckDB's double division. Such a domain has no tokens to
    # sample anyway, so exclude it from the rate table in BOTH engines
    # (the twin carries the same WHERE) instead of leaning on divergent
    # degenerate-division semantics. Its s-term was 0, so the Σ over the
    # remaining domains is unchanged.
    dom = dom.filter(col("domain_tokens") > 0)
    dom = dom.withColumn(
        "s",
        F.floor(
            F.sqrt(col("domain_tokens").cast("double")) * TEMP_SCALE
        ).cast("bigint"),
    )
    total_s = F.sum("s").over(Window.partitionBy())  # BIGINT: order-free
    rate = F.least(
        F.lit(1.0),
        (F.lit(float(budget_tokens)) * col("s").cast("double"))
        / (total_s.cast("double") * col("domain_tokens").cast("double")),
    )
    return dom.select(domain_col, "domain_tokens", rate.alias("rate"))


def sample_temperature_mixture(
    docs: DataFrame,
    budget_tokens: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sampled corpus rows ``(id, domain, n_tok)`` for a τ=0.5
    temperature mixture of roughly ``budget_tokens`` tokens. Same
    plan shape as :func:`sample_domain_mixture`: one 2-column corpus
    aggregation for the rate table, then a broadcast-rate hash filter
    — the corpus is never shuffled."""
    features = _doc_sampling_features(docs, domain_col, id_col, text_col)
    rates = temperature_rates(features, domain_col, budget_tokens)
    return (
        features.join(
            F.broadcast(rates.select(domain_col, "rate")), domain_col
        )
        .filter(col("_fp").cast("double") < col("rate") * float(ACCEPT_MOD))
        .select(id_col, domain_col, "n_tok")
    )


def sample_temperature_mixture_duck(
    budget_tokens: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`sample_temperature_mixture`."""
    toks = H.tokens(text_col)[1]
    fp = T.fingerprint_duck(text_col)
    return f"""
WITH d AS (
    SELECT {id_col}, {domain_col},
           CAST(len({toks}) AS BIGINT) AS n_tok,
           ({fp}) % {ACCEPT_MOD} AS fp
    FROM {table}
), dom AS (
    SELECT {domain_col}, CAST(sum(n_tok) AS BIGINT) AS domain_tokens
    FROM d GROUP BY {domain_col}
), doms AS (
    SELECT {domain_col}, domain_tokens,
           CAST(floor(sqrt(CAST(domain_tokens AS DOUBLE)) * {TEMP_SCALE}) AS BIGINT) AS s
    FROM dom
    WHERE domain_tokens > 0
), tot AS (
    SELECT CAST(sum(s) AS BIGINT) AS st FROM doms
), r AS (
    SELECT {domain_col},
           least(CAST(1.0 AS DOUBLE),
                 (CAST({float(budget_tokens)} AS DOUBLE) * CAST(s AS DOUBLE))
                 / (CAST(st AS DOUBLE) * CAST(domain_tokens AS DOUBLE))) AS rate
    FROM doms CROSS JOIN tot
)
SELECT d.{id_col}, d.{domain_col}, d.n_tok
FROM d JOIN r ON d.{domain_col} = r.{domain_col}
WHERE CAST(d.fp AS DOUBLE) < r.rate * {float(ACCEPT_MOD)}
"""


def sample_domain_mixture_duck(
    budget_tokens: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`sample_domain_mixture` (same arithmetic,
    same acceptance threshold)."""
    toks = H.tokens(text_col)[1]
    fp = T.fingerprint_duck(text_col)
    return f"""
WITH d AS (
    SELECT {id_col}, {domain_col},
           CAST(len({toks}) AS BIGINT) AS n_tok,
           ({fp}) % {ACCEPT_MOD} AS fp
    FROM {table}
), dom AS (
    SELECT {domain_col}, CAST(sum(n_tok) AS BIGINT) AS domain_tokens
    FROM d GROUP BY {domain_col}
    HAVING CAST(sum(n_tok) AS BIGINT) > 0
), r AS (
    SELECT {domain_col},
           least(CAST(1.0 AS DOUBLE),
                 CAST({float(budget_tokens)} AS DOUBLE)
                 / CAST((SELECT count(*) FROM dom) * domain_tokens AS DOUBLE))
               AS rate
    FROM dom
)
SELECT d.{id_col}, d.{domain_col}, d.n_tok
FROM d JOIN r ON d.{domain_col} = r.{domain_col}
WHERE CAST(d.fp AS DOUBLE) < r.rate * {float(ACCEPT_MOD)}
"""
