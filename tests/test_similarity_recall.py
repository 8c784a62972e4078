"""ANN quality gates: approximate indexes must actually FIND the
neighbors — a fast index with bad recall is worse than no index."""

from __future__ import annotations

from conftest import TEST_SF_DIR
from hdb_resale_price_data_pipeline_spark.queries import local_queries

REGISTRY = local_queries()


def _topk_ids(spark, name):
    return [r.vec_id for r in REGISTRY[name].fn(spark, TEST_SF_DIR).collect()]


def test_ivf_kmeans_recall_vs_brute_force(spark):
    exact = set(_topk_ids(spark, "emb_cosine_topk"))
    approx = set(_topk_ids(spark, "emb_ivf_kmeans_topk"))
    recall = len(exact & approx) / len(exact)
    # nprobe=2 of K=8 trained lists: the true neighborhood should land
    # mostly in the probed cells
    assert recall >= 0.5, f"recall {recall}"


def test_pq_refined_recall_vs_brute_force(spark):
    exact = set(_topk_ids(spark, "emb_cosine_topk"))
    approx = set(_topk_ids(spark, "emb_pq_topk"))
    recall = len(exact & approx) / len(exact)
    # 64x-compressed codes + 4k exact re-rank: the shortlist should
    # recover most of the true top-k
    assert recall >= 0.5, f"recall {recall}"


def test_pq_codes_shape(spark):
    """Every vector gets M codes in [0, ksub)."""
    from hdb_resale_price_data_pipeline_spark.queries.similarity import (
        PQ_KSUB,
        PQ_M,
        _pq_index,
    )

    _, encoded = _pq_index(spark, TEST_SF_DIR)
    from pyspark.sql import functions as F

    bad = encoded.filter(
        (F.size("pq_code") != PQ_M)
        | (F.array_min("pq_code") < 0)
        | (F.array_max("pq_code") >= PQ_KSUB)
    ).count()
    assert bad == 0
    assert encoded.count() == encoded.select("vec_id").distinct().count()


def test_filtered_topk_recall_vs_filtered_brute_force(spark):
    """Filtered ANN must recover the top-k of the PREDICATE-RESTRICTED
    brute force; over-probing (nprobe 2 -> 4) compensates for the ~10%
    label selectivity decimating each probed list."""
    from pyspark.sql import functions as F

    from hdb_resale_price_data_pipeline_spark.operators import similarity as S
    from hdb_resale_price_data_pipeline_spark.queries.base import t
    from hdb_resale_price_data_pipeline_spark.queries.similarity import (
        FILTER_LABEL,
        QUERY_VEC_ID,
        TOP_K,
    )

    emb = t(spark, TEST_SF_DIR, "embeddings")
    q_vec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .first()
        .embedding
    ]
    q_lit = F.array(*[F.lit(v) for v in q_vec]).cast("array<float>")
    exact = {
        r.vec_id
        for r in (
            emb.filter(
                (F.col("label") == FILTER_LABEL)
                & (F.col("vec_id") != QUERY_VEC_ID)
            )
            .withColumn("q_emb", q_lit)
            .select(
                "vec_id",
                S.cosine_expr("embedding", "q_emb", dim=len(q_vec)).alias("c"),
            )
            .orderBy(F.col("c").desc(), F.col("vec_id"))
            .limit(TOP_K)
            .collect()
        )
    }
    approx = set(_topk_ids(spark, "emb_filtered_topk"))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"filtered recall {recall}"


def test_ivf_kmeans_matches_sampled_ivf_shape(spark):
    """Same output schema and k as the sampled-codebook IVF — the
    trained index is a drop-in replacement."""
    km = REGISTRY["emb_ivf_kmeans_topk"].fn(spark, TEST_SF_DIR)
    sampled = REGISTRY["emb_ivf_topk"].fn(spark, TEST_SF_DIR)
    assert km.columns == sampled.columns
    assert km.count() == sampled.count()


def test_ivfpq_recall_vs_brute_force(spark):
    """The composed index inherits BOTH approximations (coarse probe
    pruning + code quantization); the exact re-rank must still recover
    most of the true top-k."""
    exact = set(_topk_ids(spark, "emb_cosine_topk"))
    approx = set(_topk_ids(spark, "emb_ivfpq_topk"))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"recall {recall}"


def test_ivfpq_is_a_subset_refinement_of_probed_lists(spark):
    """Every IVF-PQ hit must come from a probed inverted list — the
    composition prunes, it never invents candidates."""
    from pyspark.sql.functions import col

    from hdb_resale_price_data_pipeline_spark.queries.similarity import (
        IVF_NPROBE,
        QUERY_VEC_ID,
        _ivfpq_index,
        _probe_ids,
    )

    coarse, _, encoded = _ivfpq_index(spark, TEST_SF_DIR)
    q_vec = [
        float(v)
        for v in encoded.filter(col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .first()
        .embedding
    ]
    probed = set(_probe_ids(coarse, q_vec, IVF_NPROBE))
    member_ids = {
        r.vec_id
        for r in encoded.filter(col("ivf_cid").isin(list(probed)))
        .select("vec_id")
        .collect()
    }
    hits = set(_topk_ids(spark, "emb_ivfpq_topk"))
    assert hits <= member_ids


def test_ivfadc_recall_vs_brute_force(spark):
    """Residual quantization earns its keep on corpora with TIGHT
    coarse lists (residuals concentrate near the origin); on this
    near-uniform synthetic corpus it measures 0.7 vs raw-vector PQ's
    0.9 — both variants are shipped because which wins is a data
    property, and the floor here gates only that the residual path is
    functional, not that it dominates."""
    exact = set(_topk_ids(spark, "emb_cosine_topk"))
    approx = set(_topk_ids(spark, "emb_ivfadc_topk"))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"recall {recall}"


def test_emb_outliers_fraction_and_extremity(spark):
    """Per-cluster p99 thresholding: outliers are ≈1% of each cluster
    (at most the tie-bunched ceiling), never more than the cluster
    size, and every cluster reports a threshold."""
    rows = REGISTRY["emb_outliers"].fn(spark, TEST_SF_DIR).collect()
    assert len(rows) > 0
    total = sum(r.n_vecs for r in rows)
    out = sum(r.n_outliers for r in rows)
    assert 0 <= out / total <= 0.02  # ~1%, grid ties only shrink it
    for r in rows:
        assert 0 <= r.n_outliers < r.n_vecs
        assert r.thr_qd is not None
