#!/usr/bin/env python3
"""ANN recall/latency tradeoff sweep — the tuning table an operator of
the similarity-search family actually needs: recall@k vs probe width
for the trained-k-means IVF index, and recall@k vs shortlist width
(refine factor) for the PQ/ADC pipeline, each next to its measured
wall-clock at $SPARK_GRAFT_SF_DIR (default sf0.1).

Both sweeps ride the same session-cached indexes the registered
queries use (`_ivf_kmeans_index`, `_pq_index`), so the build cost is
paid once and each cell times the SERVING path only — matching how an
index is actually operated (built rarely, probed constantly).

Recall is averaged over N_QUERIES distinct query vectors (a single
query quantizes recall@10 to tenths, which hides real differences);
the exact baseline is the brute-force cosine top-k per query. Prints
a markdown table for BENCH_history.md.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from hdb_resale_price_data_pipeline_spark.session import get_spark_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERIES = 20
REPS = 3  # timed reps per cell (median), after one warm pass


def _query_vecs(emb, n):
    rows = (
        emb.filter(col("vec_id") < n).select("vec_id", "embedding").collect()
    )
    return {r.vec_id: [float(v) for v in r.embedding] for r in rows}


def _exact_topk(emb, qid, q_vec, k):
    from hdb_resale_price_data_pipeline_spark.operators import similarity as S

    dim = len(q_vec)
    q_lit = F.array(*[F.lit(float(v)) for v in q_vec]).cast("array<float>")
    return [
        r.vec_id
        for r in (
            emb.filter(col("vec_id") != qid)
            .withColumn("q_emb", q_lit)
            .select("vec_id", S.cosine_expr("embedding", "q_emb", dim=dim).alias("c"))
            .orderBy(col("c").desc(), col("vec_id"))
            .limit(k)
            .collect()
        )
    ]


def sweep(spark) -> None:
    from hdb_resale_price_data_pipeline_spark.operators import similarity as S
    from hdb_resale_price_data_pipeline_spark.operators.pq import pq_topk_refined
    from hdb_resale_price_data_pipeline_spark.queries.base import t
    from hdb_resale_price_data_pipeline_spark.queries.similarity import (
        IVF_K,
        TOP_K,
        _ivf_kmeans_index,
        _pq_index,
        _probe_ids,
    )

    emb = t(spark, SF_DIR, "embeddings")
    n_vec = emb.count()
    print(f"embeddings: {n_vec:,} rows at {SF_DIR}")
    queries = _query_vecs(emb, N_QUERIES)
    # Recall denominators use len(exact[qid]) sums, not len(queries) *
    # TOP_K: a filtered/small dataset can yield fewer than TOP_K exact
    # candidates per query, and the fixed denominator would understate
    # recall on it.
    exact = {
        qid: set(_exact_topk(emb, qid, qv, TOP_K)) for qid, qv in queries.items()
    }

    codebook, assigned = _ivf_kmeans_index(spark, SF_DIR)
    codebooks, encoded = _pq_index(spark, SF_DIR)

    def ivf_cell(nprobe):
        def run():
            hits = 0
            for qid, qv in queries.items():
                dim = len(qv)
                probe = _probe_ids(codebook, qv, nprobe)
                q_lit = F.array(*[F.lit(float(v)) for v in qv]).cast("array<float>")
                ids = [
                    r.vec_id
                    for r in (
                        assigned.filter(
                            col("ivf_cid").isin(probe) & (col("vec_id") != qid)
                        )
                        .withColumn("q_emb", q_lit)
                        .select(
                            "vec_id",
                            S.cosine_expr("embedding", "q_emb", dim=dim).alias("c"),
                        )
                        .orderBy(col("c").desc(), col("vec_id"))
                        .limit(TOP_K)
                        .collect()
                    )
                ]
                hits += len(set(ids) & exact[qid])
            return hits / sum(len(exact[q]) for q in queries)

        return run

    def pq_cell(refine):
        def run():
            hits = 0
            for qid, qv in queries.items():
                ids = [
                    r.vec_id
                    for r in pq_topk_refined(
                        encoded.filter(col("vec_id") != qid),
                        qv,
                        codebooks,
                        k=TOP_K,
                        refine_factor=refine,
                    ).collect()
                ]
                hits += len(set(ids) & exact[qid])
            return hits / sum(len(exact[q]) for q in queries)

        return run

    # SQ8 serving: one coded frame (the "index" is just the int8
    # re-encoding), per-query exact integer dot + exact re-rank
    maxabs = (
        "aggregate(transform(embedding, x -> abs(cast(x AS double))), "
        "cast(0.0 AS double), (acc, x) -> greatest(acc, x))"
    )
    qcode = (
        f"transform(embedding, x -> "
        f"cast(round(cast(x AS double) / nullif({maxabs}, 0.0) * 127, 0) AS int))"
    )
    coded = (
        emb.select(
            "vec_id",
            "embedding",
            F.expr(maxabs).alias("m"),
            F.expr(qcode).alias("qvec"),
        )
        .filter(col("m") > 0)
        .persist()
    )
    coded.count()

    def sq_cell(shortlist):
        import math

        sq_dot = S.sq_dot_udf()

        def run():
            hits = 0
            for qid, qv in queries.items():
                dim = len(qv)
                mq = max(abs(x) for x in qv)
                # HALF_UP away from zero — Spark/DuckDB round(x, 0)
                qq = [
                    int(math.copysign(math.floor(abs(x) / mq * 127 + 0.5), x))
                    for x in qv
                ]
                qq_lit = F.array(*[F.lit(int(v)) for v in qq]).cast("array<int>")
                q_lit = F.array(*[F.lit(float(v)) for v in qv]).cast("array<float>")
                sl = (
                    coded.filter(col("vec_id") != qid)
                    .withColumn("idot", sq_dot(col("qvec"), qq_lit))
                    .withColumn(
                        "aq", (col("idot").cast("double") * col("m") * mq)
                    )
                    .orderBy(col("aq").desc(), col("vec_id"))
                    .limit(shortlist)
                )
                ids = [
                    r.vec_id
                    for r in sl.withColumn("q_emb", q_lit)
                    .select(
                        "vec_id",
                        S.cosine_expr("embedding", "q_emb", dim=dim).alias("c"),
                    )
                    .orderBy(col("c").desc(), col("vec_id"))
                    .limit(TOP_K)
                    .collect()
                ]
                hits += len(set(ids) & exact[qid])
            return hits / sum(len(exact[q]) for q in queries)

        return run

    # JL random-projection serving: corpus projected once to RP_DIM int64
    # components (queries/similarity.q_emb_random_projection's operator),
    # coarse score = exact integer dot in the projected space, exact
    # cosine re-rank of a shortlist — measures how much recall the 8x
    # narrower vectors actually keep.
    RP_DIM = 8
    import numpy as np

    src_dim = S.embedding_dim(emb)
    rp_project = S.random_projection_udf(src_dim, RP_DIM)
    projected = (
        emb.select("vec_id", "embedding", rp_project(col("embedding")).alias("proj"))
        .persist()
    )
    projected.count()
    signs_t = S.rp_signs(src_dim, RP_DIM).T

    def rp_cell(shortlist):
        def run():
            hits = 0
            for qid, qv in queries.items():
                qdim = len(qv)
                xq = np.floor(np.asarray(qv, dtype=np.float64) * 1e6 + 0.5).astype(
                    np.int64
                )
                qproj = xq @ signs_t
                score = " + ".join(
                    f"proj[{j}] * {int(qproj[j])}L" for j in range(RP_DIM)
                )
                q_lit = F.array(*[F.lit(float(v)) for v in qv]).cast("array<float>")
                sl = (
                    projected.filter(col("vec_id") != qid)
                    .withColumn("pscore", F.expr(score))
                    .orderBy(col("pscore").desc(), col("vec_id"))
                    .limit(shortlist)
                )
                ids = [
                    r.vec_id
                    for r in sl.withColumn("q_emb", q_lit)
                    .select(
                        "vec_id",
                        S.cosine_expr("embedding", "q_emb", dim=qdim).alias("c"),
                    )
                    .orderBy(col("c").desc(), col("vec_id"))
                    .limit(TOP_K)
                    .collect()
                ]
                hits += len(set(ids) & exact[qid])
            return hits / sum(len(exact[q]) for q in queries)

        return run

    rows = []
    for label, cells in (
        ("IVF(kmeans) nprobe", [(p, ivf_cell(p)) for p in (1, 2, 4, IVF_K)]),
        ("PQ refine_factor", [(r, pq_cell(r)) for r in (1, 2, 4, 8)]),
        ("SQ8 shortlist", [(s, sq_cell(s)) for s in (10, 20, 40, 80)]),
        ("RP8 shortlist", [(s, rp_cell(s)) for s in (10, 20, 40, 80)]),
    ):
        for param, run in cells:
            run()  # warm (plans compiled, index hot)
            times, recall = [], None
            for _ in range(REPS):
                t0 = time.perf_counter()
                recall = run()
                times.append(time.perf_counter() - t0)
            rows.append(
                (label, param, recall, statistics.median(times) / len(queries))
            )

    print(f"\nrecall@{TOP_K} over {N_QUERIES} queries, "
          f"median serving wall per query ({REPS} reps after warm):\n")
    print("| index | param | recall@10 | s/query |")
    print("|---|---|---|---|")
    for label, param, recall, per_q in rows:
        print(f"| {label} | {param} | {recall:.2f} | {per_q:.3f} |")


def main() -> None:
    spark = get_spark_session(app_name="ann-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    sweep(spark)
    spark.stop()


if __name__ == "__main__":
    main()
