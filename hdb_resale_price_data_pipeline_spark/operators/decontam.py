"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

A training-data pipeline must remove (or at least flag) training
documents that overlap the benchmarks it will be evaluated on — the
standard method (GPT-3 appendix C, Dolma/RedPajama pipelines) is exact
word-n-gram collision between each train doc and the union of all eval
docs' n-grams.

Scale design (the part that matters at 100 TB):

- The eval side is ALWAYS small (benchmarks are thousands of docs, the
  corpus is billions), so the distinct eval n-gram set is collected into
  a **broadcast hash join** — no shuffle of the training corpus at all.
  The train side stays a single scan → explode → per-doc aggregation
  (one shuffle on ``doc_id``, partial-agg friendly).
- N-grams are carried as BIGINT polynomial hashes
  (``functions.hashing``), not strings: an 8-byte fixed-width join key
  instead of a ~40-byte string, and bit-identical in the DuckDB oracle.
- The shingle-hash staging column runs as the Arrow twin
  (``functions.arrow_text.distinct_gram_hashes_udf``) of the
  expression spec: Spark evaluates higher-order functions interpreted
  (no codegen), and the vectorized numpy fold is bit-identical
  (tests/test_arrow_text.py) at a fraction of the per-row cost — the
  same trade the MinHash/SimHash hot paths make.
- Per-doc shingle sets are deduplicated *before* the explode
  (``array_distinct``) so join multiplicity is exactly 0/1 per
  (doc, gram) and counts are set semantics, not bag.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H


def doc_shingle_hashes(text_col: str, n: int, a: int = 131, b: int = 7) -> Column:
    """Distinct hashed word ``n``-grams of a text column (array<bigint>)."""
    expr, _ = H.shingle_hashes(H.shingles(H.tokens(text_col), n), a, b)
    return F.array_distinct(F.expr(expr))


def doc_shingle_hashes_duck(text_col: str, n: int, a: int = 131, b: int = 7) -> str:
    """DuckDB twin of :func:`doc_shingle_hashes`."""
    _, duck = H.shingle_hashes(H.shingles(H.tokens(text_col), n), a, b)
    return f"list_distinct({duck})"


def contamination_report(
    docs: DataFrame,
    eval_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """Per-training-document contamination stats vs the eval partition.

    ``eval_pred`` selects the benchmark rows out of ``docs`` (in a real
    deployment the eval set is its own small table; the predicate form
    also covers the common "holdout is a slice of the corpus" case).

    Returns one row per training doc that has at least one ``n``-gram:
    ``(id, n_shingles, n_contaminated, contamination_ratio,
    is_contaminated)``.
    """
    from ..functions.arrow_text import distinct_gram_hashes_udf
    from ..shipping import ensure_package_shipped

    ensure_package_shipped(docs.sparkSession)
    grams = F.explode(distinct_gram_hashes_udf(n)(F.col(text_col))).alias("gram")
    eval_grams = (
        docs.filter(eval_pred)
        .select(grams)
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    train = docs.filter(~eval_pred).select(F.col(id_col), grams)
    hit = F.coalesce(F.col("_hit"), F.lit(0))
    return (
        train.join(F.broadcast(eval_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(hit).alias("n_contaminated"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_contaminated",
            F.round(
                F.col("n_contaminated").cast("double") / F.col("n_shingles"), 4
            ).alias("contamination_ratio"),
            (F.col("n_contaminated") >= min_hits).cast("int").alias("is_contaminated"),
        )
    )
