"""Connected-components exactness vs a driver-side union-find model."""

from __future__ import annotations

from conftest import TEST_SF_DIR
from hdb_resale_price_data_pipeline_spark.operators.components import (
    connected_components,
)
from hdb_resale_price_data_pipeline_spark.queries.dedup import (
    MINHASH_VERIFY_THRESHOLD,
    NUM_BANDS,
    ROWS_PER_BAND,
    SHINGLE_LEN,
)
from hdb_resale_price_data_pipeline_spark.operators.dedup import (
    minhash_band_pairs,
    verify_jaccard_pairs,
)
from hdb_resale_price_data_pipeline_spark.sources import read_table


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_on_synthetic(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (3, 4)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == _union_find(edges)


def test_iterative_path_matches_driver_path(spark):
    """Both execution paths of the hybrid (driver union-find under the
    edge bound, distributed min-label propagation above it) must agree —
    forced via driver_threshold=0 — including on a long path graph
    (worst diameter for label propagation) and a cross-linked clique."""
    edges = (
        [(i, i + 1) for i in range(100, 112)]  # 12-hop path
        + [(200, 201), (201, 202), (200, 202)]  # triangle
        + [(7, 300), (300, 8), (8, 301)]  # bridges
    )
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    driver = {r.node: r.component for r in connected_components(df).collect()}
    distributed = {
        r.node: r.component
        for r in connected_components(df, driver_threshold=0, max_iter=20).collect()
    }
    assert driver == distributed == _union_find(edges)


def test_dedup_clusters_match_union_find(spark):
    docs = read_table(spark, TEST_SF_DIR, "documents")
    pairs = minhash_band_pairs(docs, "doc_id", "text", SHINGLE_LEN, NUM_BANDS, ROWS_PER_BAND)
    verified = verify_jaccard_pairs(pairs, docs, "doc_id", "text", MINHASH_VERIFY_THRESHOLD)
    edge_list = [(r.doc_a, r.doc_b) for r in verified.collect()]
    got = {r.node: r.component for r in connected_components(verified).collect()}
    assert got == _union_find(edge_list)
    assert len(edge_list) > 0  # the pipeline actually found near-dups
