"""Mini-batchless Lloyd k-means over an embedding column — the trained
codebook for IVF (operators/ivf.py uses a sampled codebook; this is the
quality upgrade at real scale) and the canonical *iterative* dataflow
(SURVEY.md §7: non-SQL-expressible → rows-only driver check + invariant
tests).

Distributed shape per iteration: one broadcast of K centroids (collected
— K×dim floats, tiny), one map computing argmin assignment, one
shuffle-reduce computing per-cluster sums → new centroids. Deterministic:
init = first K vectors by id, ties → lowest centroid id, and per-cluster
means are driver-side sequential folds over ordered partial sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .ivf import assign_to_codebook


def kmeans_fit(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    k: int = 8,
    max_iter: int = 5,
) -> list[tuple[int, list[float]]]:
    """Lloyd iterations; returns the trained codebook [(cid, centroid)].

    Per-iteration driver traffic is exactly one K×dim collect (the new
    centroids) — the data never leaves the executors.
    """
    # Iterative algorithm: persist the working set — every Lloyd
    # iteration re-reads it, and at 100 TB re-scanning the source per
    # iteration is the difference between k-means working and not.
    base = (
        df.select(col(id_col).alias("_id"), col(emb_col).alias("_e"))
        .withColumn("_ed", col("_e").cast("array<double>"))
        .persist()
    )
    dim = len(base.select("_ed").first()._ed)
    codebook = [
        (i, [float(v) for v in r._ed])
        for i, r in enumerate(base.orderBy("_id").limit(k).collect())
    ]
    for _ in range(max_iter):
        assigned = assign_to_codebook(base, "_ed", codebook)
        sums = (
            assigned.select(
                "ivf_cid",
                *[F.element_at("_ed", i + 1).alias(f"v{i}") for i in range(dim)],
            )
            .groupBy("ivf_cid")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(f"v{i}").alias(f"s{i}") for i in range(dim)],
            )
            .collect()
        )
        new_codebook = []
        by_cid = {int(r.ivf_cid): r for r in sums}
        for cid, old in codebook:
            r = by_cid.get(cid)
            if r is None or r.n == 0:
                new_codebook.append((cid, old))  # empty cluster keeps its centroid
            else:
                new_codebook.append((cid, [getattr(r, f"s{i}") / r.n for i in range(dim)]))
        if all(
            a == b for (_, a), (_, b) in zip(codebook, new_codebook)
        ):
            codebook = new_codebook
            break
        codebook = new_codebook
    base.unpersist()
    return codebook


def kmeans_assign(df: DataFrame, emb_col: str, codebook: list[tuple[int, list[float]]]) -> DataFrame:
    """Final assignment with the trained codebook (shuffle-free map)."""
    staged = df.withColumn("_ed", col(emb_col).cast("array<double>"))
    return assign_to_codebook(staged, "_ed", codebook).drop("_ed")


def inertia(df: DataFrame, emb_col: str, codebook: list[tuple[int, list[float]]]) -> float:
    """Σ min-distance² — the k-means objective (for convergence tests).

    Computed from the affinity (|c|²−2⟨c,e⟩) plus |e|² so it's a true
    squared distance."""
    from .ivf import dist_to_literal_centroid

    staged = df.withColumn("_ed", col(emb_col).cast("array<double>"))
    dim = len(codebook[0][1])
    sq_e = " + ".join(
        f"cast(element_at(_ed, {i}) AS double) * cast(element_at(_ed, {i}) AS double)"
        for i in range(1, dim + 1)
    )
    dists = ", ".join(dist_to_literal_centroid("_ed", cent) for _, cent in codebook)
    total = staged.select(
        F.expr(f"array_min(array({dists})) + ({sq_e})").alias("d2")
    ).agg(F.sum("d2").alias("s")).first().s
    return float(total)
