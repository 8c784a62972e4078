"""Connected components over a pair/edge list — the final stage of
near-dup dedup at scale: candidate pairs (MinHash/SimHash verified) →
duplicate *clusters* → one canonical survivor per cluster.

Algorithm: iterative min-label propagation (each node adopts the
smallest id reachable through its edges) — the dataflow form of
union-find. Per iteration: one join edges⋈labels + one min-aggregate,
both shuffles on node id; converges in O(diameter) iterations, and
near-dup graphs are overwhelmingly tiny cliques (diameter ≤ 2-3).
Iterative → rows-only driver check; exactness is pytest-verified against
a NetworkX-free union-find model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 10
) -> DataFrame:
    """Return (node, component) where component = min node id in the
    connected component. Nodes appear iff they occur in an edge."""
    sym = (
        edges.select(col(src).alias("a"), col(dst).alias("b"))
        .unionByName(edges.select(col(dst).alias("a"), col(src).alias("b")))
        .distinct()
    )
    labels = sym.select(col("a").alias("node")).distinct().withColumn(
        "component", col("node")
    )
    for _ in range(max_iter):
        # each node pulls the smallest label among itself and neighbors
        neighbor_labels = (
            sym.join(labels, sym.b == labels.node)
            .select(col("a").alias("node"), col("component"))
        )
        new_labels = (
            labels.select("node", "component")
            .unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # convergence check: any label changed?
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), col("n.node") == col("o.node"))
            .filter(col("n.component") != col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Cluster summary: canonical (min) id, cluster size."""
    cc = connected_components(pairs, src, dst)
    return cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size")).withColumnRenamed(
        "component", "canonical_id"
    )
