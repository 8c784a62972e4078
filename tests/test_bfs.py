"""Bounded BFS (emb_bfs_reach) graph invariants beyond the oracle
match: seed hop-0, min-hop consistency against the independently-built
edge list, and frontier minimality (a node at hop h must have an
in-edge from hop h-1 and none from any earlier hop)."""

from __future__ import annotations

from collections import defaultdict

from conftest import TEST_SF_DIR

from hdb_resale_price_data_pipeline_spark.queries.similarity import (
    BFS_HOPS,
    BFS_SEED_MOD,
    q_emb_bfs_reach,
    q_emb_knn_graph,
)


def test_bfs_reach_invariants(spark):
    hops = {
        int(r.vec_id): int(r.hops)
        for r in q_emb_bfs_reach(spark, TEST_SF_DIR).collect()
    }
    edges = [
        (int(r.src), int(r.dst))
        for r in q_emb_knn_graph(spark, TEST_SF_DIR)
        .select("src", "dst")
        .collect()
    ]
    seeds = {n for n in hops if n % BFS_SEED_MOD == 0}
    assert seeds, "seed set empty — BFS_SEED_MOD no longer matches testdata"

    # hop range and seed anchoring
    assert all(0 <= h <= BFS_HOPS for h in hops.values())
    for n, h in hops.items():
        if n % BFS_SEED_MOD == 0:
            assert h == 0, n
        else:
            assert h > 0, n

    # independent BFS over the collected edge list must agree exactly
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    expect = {n: 0 for n in hops if n % BFS_SEED_MOD == 0}
    frontier = set(expect)
    for h in range(1, BFS_HOPS + 1):
        nxt = {
            d for s in frontier for d in adj[s] if d not in expect
        }
        for d in nxt:
            expect[d] = h
        frontier = nxt
    assert hops == expect
