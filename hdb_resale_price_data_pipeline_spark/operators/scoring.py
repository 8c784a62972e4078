"""Model-based corpus scoring: bigram-LM perplexity (CCNet-style),
BM25 retrieval, and DSIR hashed-n-gram importance weights.

These are the data-selection operators of a training-data pipeline
(beyond the reference's surface, like the dedup/ANN families): score
every document against a small model derived from the corpus itself —
an LM trained on a trusted slice (Wenzek et al. 2020, CCNet), a query's
BM25 relevance (Robertson/Sparck Jones), or an importance weight from
hashed n-gram feature distributions (Xie et al. 2023, DSIR).

Cross-engine exactness discipline
---------------------------------
Every score ends in a *sum* of per-feature log terms, and IEEE float
addition is order-sensitive — a grouped SUM(double) can never value-hash
against DuckDB. The fix used throughout this module: quantize each log
term to a BIGINT grid (``round(ln(...) * LOG_SCALE)``) at the point
where the ONLY non-exactly-rounded operation (``ln``) happens, then sum
BIGINTs — integer addition is order-free and exact in both engines. The
+-*-/ chain feeding ``ln`` is identical expression text on both sides,
and those operators ARE exactly rounded per IEEE-754, so the double
reaching ``ln`` is bit-identical; a 1-ulp ``ln`` divergence only matters
within ~1e-12 of a grid boundary (measure-zero in practice, and only
evaluated once per model row / occurrence).

Scale notes
-----------
All three operators share the shape: (1) one corpus pass building a
model-sized aggregate (vocabulary counts, per-term document frequency,
64 feature buckets); (2) the model broadcast back into a second
map-heavy corpus pass; (3) at most ONE shuffle on doc_id for the final
per-document fold (BM25 needs none — per-doc tf is a map-side array
fold, and top-k is TakeOrderedAndProject). Nothing is ever joined
doc-to-doc; the corpus is never shuffled on data-sized keys. At 100 TB
the only watch-item is model size: a web-scale vocabulary outgrows a
broadcast, at which point the model joins become shuffle hash joins on
the model key with the composition unchanged (DSIR's 64-bucket model
never grows at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from ..functions import hashing as H

LOG_SCALE = 10_000  # quantization grid for per-feature log terms


def avg_presentation_sql(num: str, den: str) -> str:
    """4-decimal presentation average of a quantized-BIGINT sum over a
    count: ``floor(num/den + 0.5) / LOG_SCALE`` — repr-free rounding
    (identical text both engines; see score_perplexity for why round()
    cannot be used on integer-ratio quotients)."""
    return (
        f"CAST(floor(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE) "
        f"+ CAST(0.5 AS DOUBLE)) AS BIGINT) / CAST({LOG_SCALE} AS DOUBLE)"
    )

# ---------------------------------------------------------------------------
# Bigram LM perplexity (CCNet-style quality scoring)
# ---------------------------------------------------------------------------

# add-one-smoothed bigram logprob, quantized. Both engines see the same
# expression text modulo coalesce/list spelling: the double reaching ln()
# is built with exactly-rounded ops from integers, so it is bit-identical.
_LP_FMT = (
    "CAST(round(ln(CAST({bc} + 1 AS DOUBLE) / CAST({uc} + {v} AS DOUBLE)) * {scale}) "
    "AS BIGINT)"
)


def lm_logprob_sql(bc: str, uc: str, v: str) -> str:
    """Quantized add-one bigram log-probability (same text both engines)."""
    return _LP_FMT.format(bc=bc, uc=uc, v=v, scale=LOG_SCALE)


def train_bigram_lm(train: DataFrame, text_col: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Unigram counts, bigram counts, and 1-row vocab size over the
    trusted slice. Two model-sized hash aggregations (map-side partial
    combine collapses per-token rows before the shuffle)."""
    tok_s, _ = H.tokens(text_col)
    bg_s, _ = H.shingles(H.tokens(text_col), 2)
    uni = (
        train.select(F.explode(F.expr(tok_s)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("uc"))
    )
    big = (
        train.select(F.explode(F.expr(bg_s)).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("bc"))
    )
    vocab = uni.agg(F.count("*").alias("vsz"))
    return uni, big, vocab


def score_perplexity(docs: DataFrame, text_col: str, uni: DataFrame, big: DataFrame,
                     vocab: DataFrame) -> DataFrame:
    """Per-document average negative log-likelihood under the bigram LM.

    Plan: corpus scan → explode bigrams (map) → two broadcast left joins
    against the model → map-side quantized logprob → ONE doc_id shuffle
    for the integer fold. ``nll_q`` is the exact BIGINT sum; ``avg_nll``
    the presentation double (per-token NLL ≡ log-perplexity).
    """
    bg_s, _ = H.shingles(H.tokens(text_col), 2)
    occ = (
        docs.select("doc_id", F.explode(F.expr(bg_s)).alias("bg"))
        .withColumn("w1", F.substring_index(col("bg"), " ", 1))
    )
    scored = (
        occ.join(broadcast(big), "bg", "left")
        .join(broadcast(uni), occ["w1"] == uni["w"], "left")
        .crossJoin(broadcast(vocab))
        .select(
            "doc_id",
            F.expr(
                lm_logprob_sql("coalesce(bc, 0)", "coalesce(uc, 0)", "vsz")
            ).alias("lpq"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), (-F.sum("lpq")).alias("nll_q"))
        .select(
            "doc_id",
            "n_bigrams",
            "nll_q",
            # floor(q + 0.5), not round(q, 4): round() on a double
            # consults the shortest decimal repr in Spark but the binary
            # value in DuckDB, so integer-ratio quotients landing on
            # .xxxx5 ties diverge; floor over the (bit-identical)
            # quotient is repr-free and deterministic on both engines.
            F.expr(avg_presentation_sql("nll_q", "n_bigrams")).alias("avg_nll"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 (Robertson idf; k1/b term saturation + length normalization)
# ---------------------------------------------------------------------------

BM25_K1 = "CAST(1.2 AS DOUBLE)"
BM25_B = "CAST(0.75 AS DOUBLE)"

# Quantized per-term BM25 contribution. idf's ln() is the only libm op;
# everything else is exactly-rounded IEEE arithmetic on integers /
# already-identical doubles, written as ONE shared expression string so
# the evaluation tree (and thus every rounding step) matches across
# engines.
_BM25_FMT = (
    "CAST(round("
    "ln(CAST(1 AS DOUBLE) + (CAST({n} - {df} AS DOUBLE) + CAST(0.5 AS DOUBLE))"
    " / (CAST({df} AS DOUBLE) + CAST(0.5 AS DOUBLE)))"
    " * (CAST({tf} AS DOUBLE) * ({k1} + CAST(1 AS DOUBLE)))"
    " / (CAST({tf} AS DOUBLE) + {k1} * (CAST(1 AS DOUBLE) - {b}"
    " + {b} * CAST({dl} AS DOUBLE) / {avgdl}))"
    " * {scale}) AS BIGINT)"
)


def bm25_contrib_sql(n: str, df: str, tf: str, dl: str, avgdl: str) -> str:
    return _BM25_FMT.format(
        n=n, df=df, tf=tf, dl=dl, avgdl=avgdl, k1=BM25_K1, b=BM25_B, scale=LOG_SCALE
    )


def bm25_topk(docs: DataFrame, text_col: str, terms: list[str], k: int) -> DataFrame:
    """Top-k documents by BM25 for a fixed term set.

    Plan: one corpus pass computing the global stats (N, Σdl, per-term
    df) as a 1-row broadcast, then a second map-only pass scoring each
    doc from its own token array (per-term tf = array fold — the corpus
    is never exploded or shuffled), finished by TakeOrderedAndProject.
    Zero data-sized shuffles.
    """
    tok_s, _ = H.tokens(text_col)
    toks = docs.select("doc_id", F.expr(tok_s).alias("toks")).withColumn(
        "dl", F.size("toks").cast("long")
    )
    stats = toks.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("total_len"),
        *[
            F.sum(F.array_contains(col("toks"), F.lit(t)).cast("long")).alias(f"df{i}")
            for i, t in enumerate(terms)
        ],
    )
    avgdl = "(CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    contribs = [
        bm25_contrib_sql(
            "n_docs", f"df{i}", f"size(filter(toks, x -> x = '{t}'))", "dl", avgdl
        )
        for i, t in enumerate(terms)
    ]
    score_q = " + ".join(f"({c})" for c in contribs)
    return (
        toks.crossJoin(broadcast(stats))
        .select(
            "doc_id",
            "dl",
            F.expr(score_q).alias("score_q"),
        )
        .withColumn(
            "score", F.round(col("score_q").cast("double") / LOG_SCALE, 4)
        )
        .orderBy(col("score_q").desc(), col("doc_id"))
        .limit(k)
    )


def bm25_topk_oracle(terms: list[str], k: int, tok_duck: str) -> str:
    """DuckDB twin of :func:`bm25_topk` (same expression strings)."""
    df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df{i}"
        for i, t in enumerate(terms)
    )
    avgdl = "(CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    contribs = [
        bm25_contrib_sql(
            "n_docs", f"df{i}", f"len(list_filter(toks, x -> x = '{t}'))", "dl", avgdl
        )
        for i, t in enumerate(terms)
    ]
    score_q = " + ".join(f"({c})" for c in contribs)
    return f"""
WITH toks AS (
  SELECT doc_id, {tok_duck} AS toks, CAST(len({tok_duck}) AS BIGINT) AS dl
  FROM documents
),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS total_len,
         {df_cols}
  FROM toks
)
SELECT doc_id, dl, {score_q} AS score_q,
       round(CAST({score_q} AS DOUBLE) / {LOG_SCALE}, 4) AS score
FROM toks CROSS JOIN stats
ORDER BY score_q DESC, doc_id
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# DSIR importance weights (hashed unigram+bigram features, 64 buckets)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 64

# add-one-smoothed log(p_target(b) / p_raw(b)), quantized
_LR_FMT = (
    "CAST(round((ln(CAST({tb} + 1 AS DOUBLE) / CAST({tt} + {nb} AS DOUBLE))"
    " - ln(CAST({rb} + 1 AS DOUBLE) / CAST({rt} + {nb} AS DOUBLE))) * {scale}) AS BIGINT)"
)


def dsir_logratio_sql(tb: str, tt: str, rb: str, rt: str) -> str:
    return _LR_FMT.format(tb=tb, tt=tt, rb=rb, rt=rt, nb=DSIR_BUCKETS, scale=LOG_SCALE)


def dsir_features_sql(text_col: str) -> tuple[str, str]:
    """Hashed unigram + bigram feature array (spark, duck)."""
    uni_s, uni_d = H.shingle_hashes(H.tokens(text_col), 131, 7)
    bg_s, bg_d = H.shingle_hashes(H.shingles(H.tokens(text_col), 2), 131, 7)
    return f"concat({uni_s}, {bg_s})", f"list_concat({uni_d}, {bg_d})"


def dsir_logweights(docs: DataFrame, text_col: str, target: Column) -> DataFrame:
    """Per-document DSIR log importance weight log(p_target/p_raw).

    Plan: pass 1 — explode hashed features, ONE 64-row hash aggregation
    holding raw and target counts side by side (window-total over the
    64-row frame, single tiny task, mirrors operators/sampling.py); pass
    2 — explode again, map-side broadcast join to the 64-row log-ratio
    table, ONE doc_id shuffle for the exact integer fold. The model is
    fixed-size (64 rows) at any corpus scale.
    """
    from pyspark.sql import Window

    feats_s, _ = dsir_features_sql(text_col)
    occ = docs.select(
        "doc_id",
        target.cast("long").alias("_t"),
        F.explode(F.expr(feats_s)).alias("h"),
    ).select("doc_id", "_t", (col("h") % DSIR_BUCKETS).alias("b"))
    rates = occ.groupBy("b").agg(
        F.count("*").alias("rbc"),
        F.sum("_t").alias("tbc"),
    )
    w = Window.partitionBy()
    rates = rates.select(
        "b",
        "rbc",
        "tbc",
        F.sum("rbc").over(w).alias("rt"),
        F.sum("tbc").over(w).alias("tt"),
    ).select(
        "b",
        F.expr(dsir_logratio_sql("tbc", "tt", "rbc", "rt")).alias("lrq"),
    )
    return (
        occ.join(broadcast(rates), "b")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_feats"), F.sum("lrq").alias("logw_q"))
        .select(
            "doc_id",
            "n_feats",
            "logw_q",
            F.expr(avg_presentation_sql("logw_q", "n_feats")).alias("avg_logw"),
        )
    )
