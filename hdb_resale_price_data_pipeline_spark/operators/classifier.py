"""Distributed logistic-regression quality/domain classifier over hashed
text features — the fasttext-style linear-classifier shape (Joulin et
al. 2016) used by LLM corpus pipelines to score documents against a
target domain, trained WHOLLY inside the engine.

Training dataflow (the interesting part): full-batch gradient descent,
one codegen-only Spark job per iteration —

    corpus slice → map-side featurize (hashed unigram+bigram buckets,
    normalized counts + bias) → per-doc sigmoid + QUANTIZED per-bucket
    gradient contribution → ONE hash aggregation of B+1 BIGINT sums →
    1-row driver update of the (B+1)-float weight vector.

No mapInPandas, no partition-ordered fold: quantizing each document's
gradient contribution to a BIGINT grid (``round(g * GRAD_SCALE)``)
makes the gradient sum COMMUTATIVE-EXACT, so Spark's unordered partial
aggregation and DuckDB's unordered SUM reach the identical integer —
the trick that lets an *iterative trained model* carry a full SQL
oracle (the GD unroll mirrors the Lloyd-unroll CTE the k-means/PQ
oracles use, one CTE layer pair per iteration; see
queries/text.py::_lr_oracle). Within one iteration the only libm call
is ``exp`` in the sigmoid, quantized immediately; the weight update is
a fixed chain of exactly-rounded IEEE ops replicated verbatim in SQL,
so Python-driver floats and DuckDB-derived doubles stay bit-identical
across iterations.

Scale: per-iteration driver traffic is ONE row of B+1 longs; the
working set is the featurized train slice (persist it — every GD pass
re-reads it, exactly the kmeans discipline). B is fixed (16+bias), so
model size is independent of corpus scale; at 100 TB you train on a
sampled slice (here: the deterministic doc_id-parity slice) and score
the full corpus with one map-only pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import scoring as SC

N_BUCKETS = 16  # + 1 bias term
LR = 0.5
N_ITERS = 4
PROB_SCALE = 1_000_000  # sigmoid / gradient quantization grid
_D = N_BUCKETS + 1  # weight dimension


def hashed_x_sql() -> tuple[str, str]:
    """Normalized bucket-count feature vector + bias, (spark, duck).
    Built from an ``hm`` column holding the bucketed feature hashes."""
    spark = (
        f"concat(transform(sequence(0, {N_BUCKETS - 1}), "
        f"b -> CAST(size(filter(hm, h -> h = b)) AS DOUBLE) / CAST(size(hm) AS DOUBLE)), "
        f"array(CAST(1 AS DOUBLE)))"
    )
    duck = (
        f"list_concat(list_transform(range(0, {N_BUCKETS}), "
        f"b -> CAST(len(list_filter(hm, h -> h = b)) AS DOUBLE) / CAST(len(hm) AS DOUBLE)), "
        f"[CAST(1 AS DOUBLE)])"
    )
    return spark, duck


def hm_sql(text_col: str) -> tuple[str, str]:
    feats_s, feats_d = SC.dsir_features_sql(text_col)
    return (
        f"transform({feats_s}, h -> h % {N_BUCKETS})",
        f"list_transform({feats_d}, h -> h % {N_BUCKETS})",
    )


def z_sql(warr: str, engine: str) -> str:
    """Sequential index-ordered dot-product fold of x against ``warr``
    — fixed fold order on both engines, so the double is bit-identical."""
    if engine == "spark":
        return (
            f"aggregate(transform(sequence(1, {_D}), "
            f"i -> element_at(x, i) * element_at({warr}, i)), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {_D + 1}), i -> x[i] * ({warr})[i])), "
        f"(acc, v) -> acc + v)"
    )


def pq_sql(z: str) -> str:
    """Quantized sigmoid (same text both engines; exp() is the one libm
    call, neutralized by the grid)."""
    return (
        f"CAST(round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-({z}))) "
        f"* {PROB_SCALE}) AS BIGINT)"
    )


def gq_sql(i: int, engine: str) -> str:
    """Quantized gradient contribution of one doc for weight ``i``
    (1-indexed): round((p - y) * x_i * SCALE) — BIGINT, so the
    cross-partition / cross-engine sum is order-free exact."""
    xi = f"element_at(x, {i})" if engine == "spark" else f"x[{i}]"
    return (
        f"CAST(round((CAST(pq AS DOUBLE) / {PROB_SCALE} - y) * {xi} "
        f"* {PROB_SCALE}) AS BIGINT)"
    )


def w_literal(w: list[float]) -> str:
    """Weight vector as a Spark array literal. ``repr`` emits the
    shortest round-trip decimal and both engines' parsers are correctly
    rounded, so the literal reconstructs the exact double."""
    return "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in w) + ")"


def featurize(docs: DataFrame, text_col: str, label: Column) -> DataFrame:
    hm_s, _ = hm_sql(text_col)
    x_s, _ = hashed_x_sql()
    return (
        docs.select("doc_id", label.cast("double").alias("y"), F.expr(hm_s).alias("hm"))
        .select("doc_id", "y", F.expr(x_s).alias("x"))
    )


def lr_train(train_fx: DataFrame) -> list[float]:
    """Full-batch GD on a featurized (y, x) frame; returns the trained
    weights. One codegen aggregation job per iteration; the driver sees
    B+1 longs per pass."""
    train_fx = train_fx.persist()
    try:
        w = [0.0] * _D
        for _ in range(N_ITERS):  # noqa: B007 — w carries the state
            scored = train_fx.select(
                "y", "x", F.expr(pq_sql(z_sql(w_literal(w), "spark"))).alias("pq")
            )
            row = scored.agg(
                F.count("*").alias("n"),
                *[F.sum(F.expr(gq_sql(i, "spark"))).alias(f"g{i}") for i in range(1, _D + 1)],
            ).collect()[0]
            n = row["n"]
            if n == 0:
                raise ValueError(
                    "lr_train: empty training slice — weights would become NaN"
                )
            # exact-IEEE update chain, replicated verbatim in the oracle:
            # w_i - LR * (g_i / SCALE) / n
            w = [
                w[i - 1] - LR * (float(row[f"g{i}"]) / PROB_SCALE) / float(n)
                for i in range(1, _D + 1)
            ]
        return w
    finally:
        train_fx.unpersist()


def lr_score(all_fx: DataFrame, w: list[float]) -> DataFrame:
    """Map-only scoring pass with the trained weights."""
    return all_fx.select(
        "doc_id",
        F.expr(pq_sql(z_sql(w_literal(w), "spark"))).alias("prob_q"),
        F.col("y").cast("int").alias("is_target"),
    ).select(
        "doc_id",
        "prob_q",
        (F.col("prob_q").cast("double") / PROB_SCALE).alias("prob"),
        F.expr(
            f"CASE WHEN prob_q >= {PROB_SCALE // 2} THEN 1 ELSE 0 END"
        ).alias("pred"),
        "is_target",
    )


def lr_oracle(label_duck: str, train_pred: str) -> str:
    """The GD-unroll CTE twin: one (scored, grads, weights) layer per
    iteration, then the final scoring pass over the full corpus."""
    hm_d = hm_sql("text")[1]
    x_d = hashed_x_sql()[1]
    pq_d = pq_sql(z_sql("w", "duck"))
    zeros = ", ".join(["CAST(0 AS DOUBLE)"] * _D)
    layers = [
        f"""dx AS MATERIALIZED (
  SELECT doc_id, CAST({label_duck} AS DOUBLE) AS y, {x_d} AS x
  FROM (SELECT doc_id, lang, {hm_d} AS hm FROM documents WHERE {train_pred})
),
ax AS MATERIALIZED (
  SELECT doc_id, CAST({label_duck} AS DOUBLE) AS y, {x_d} AS x
  FROM (SELECT doc_id, lang, {hm_d} AS hm FROM documents)
),
w0 AS (SELECT [{zeros}] AS w)"""
    ]
    for t in range(N_ITERS):
        gcols = ",\n         ".join(
            f"CAST(sum({gq_sql(i, 'duck')}) AS BIGINT) AS g{i}" for i in range(1, _D + 1)
        )
        wupd = ", ".join(
            f"w[{i}] - CAST({LR!r} AS DOUBLE) * (CAST(g{i} AS DOUBLE) / {PROB_SCALE}) "
            f"/ CAST(n AS DOUBLE)"
            for i in range(1, _D + 1)
        )
        layers.append(
            f"""sc{t} AS (SELECT y, x, {pq_d} AS pq FROM dx CROSS JOIN w{t}),
gr{t} AS (SELECT count(*) AS n, {gcols} FROM sc{t}),
w{t + 1} AS (SELECT [{wupd}] AS w FROM w{t} CROSS JOIN gr{t})"""
        )
    joined = ",\n".join(layers)
    return f"""
WITH {joined}
SELECT doc_id, pq AS prob_q,
       CAST(pq AS DOUBLE) / {PROB_SCALE} AS prob,
       CASE WHEN pq >= {PROB_SCALE // 2} THEN 1 ELSE 0 END AS pred,
       CAST(y AS INT) AS is_target
FROM (SELECT doc_id, y, {pq_d} AS pq FROM ax CROSS JOIN w{N_ITERS})
"""
