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


class TestIncrementalComponents:
    """incremental_components must equal a full recompute over the
    union graph — star edges are connectivity-equivalent to the
    original pairs."""

    def _full(self, spark, edges):
        from hdb_resale_price_data_pipeline_spark.operators.components import (
            connected_components,
        )

        df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
        return {
            (r.node, r.component)
            for r in connected_components(df, "id_a", "id_b").collect()
        }

    def test_batch_merges_two_existing_clusters_via_bridge(self, spark):
        from hdb_resale_price_data_pipeline_spark.operators.components import (
            connected_components,
            incremental_components,
        )

        old_edges = [(1, 2), (10, 11)]  # two seed clusters {1,2}, {10,11}
        new_edges = [(2, 50), (50, 10), (60, 61)]  # 50 bridges both; {60,61} new
        seed = connected_components(
            spark.createDataFrame(old_edges, "id_a bigint, id_b bigint"),
            "id_a",
            "id_b",
        )
        inc = incremental_components(
            seed, spark.createDataFrame(new_edges, "id_a bigint, id_b bigint")
        )
        got = {(r.node, r.component) for r in inc.collect()}
        assert got == self._full(spark, old_edges + new_edges)
        # the bridge collapsed everything reachable onto min id 1
        assert {c for n, c in got if n in (1, 2, 10, 11, 50)} == {1}
        assert {c for n, c in got if n in (60, 61)} == {60}

    def test_seeded_resolution_matches_full_recompute_on_random_graph(self, spark):
        import random

        from hdb_resale_price_data_pipeline_spark.operators.components import (
            connected_components,
            incremental_components,
        )

        rng = random.Random(42)  # deterministic
        nodes = list(range(100))
        all_edges = [
            (min(a, b), max(a, b))
            for a, b in (
                (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
            )
            if a != b
        ]
        cut = len(all_edges) // 2
        old_edges, new_edges = all_edges[:cut], all_edges[cut:]
        seed = connected_components(
            spark.createDataFrame(old_edges, "id_a bigint, id_b bigint"),
            "id_a",
            "id_b",
        )
        inc = incremental_components(
            seed, spark.createDataFrame(new_edges, "id_a bigint, id_b bigint")
        )
        got = {(r.node, r.component) for r in inc.collect()}
        # full recompute covers the same node set (nodes on any edge)
        assert got == self._full(spark, all_edges)

    def test_external_singleton_labels_are_preserved(self, spark):
        """r6 ADVICE: a labels input from an external registry may hold
        TRUE singletons (node == component, no co-member). The star-edge
        filter drops their only row, so they must be unioned back —
        unless a new edge touches them, in which case the resolved label
        wins."""
        from hdb_resale_price_data_pipeline_spark.operators.components import (
            incremental_components,
        )

        labels = spark.createDataFrame(
            # {1,2} cluster + singletons 7 (untouched) and 9 (re-linked)
            [(1, 1), (2, 1), (7, 7), (9, 9)],
            "node bigint, component bigint",
        )
        new_edges = [(9, 3)]  # links singleton 9 to brand-new node 3
        inc = incremental_components(
            labels, spark.createDataFrame(new_edges, "id_a bigint, id_b bigint")
        )
        got = {(r.node, r.component) for r in inc.collect()}
        assert (7, 7) in got, "untouched singleton silently dropped"
        assert (9, 3) in got and (3, 3) in got, "re-linked singleton resolves"
        assert {(1, 1), (2, 1)} <= got
        assert len(got) == 5
