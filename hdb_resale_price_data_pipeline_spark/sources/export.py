"""Training export: deterministic globally-shuffled, size-bounded
shards with a manifest.

A training loader wants three things from an exported dataset:

- **a reproducible global shuffle** — sequential corpus order (by
  source, by crawl date) biases SGD; ``df.sample``/``orderBy(rand())``
  give a different permutation per run. Sorting on a hash of the id is
  a pure function of the data: the same corpus always exports in the
  same pseudo-random order, on any cluster layout.
- **bounded shard sizes** — loaders stripe shards across data-parallel
  workers; one giant or one tiny file breaks the striping.
- **a manifest** — shard list + row counts, so the loader can plan
  epochs/resumption without listing or opening parquet footers itself.

Spark-native shape: ``repartitionByRange`` on the hash key splits the
permutation into ``n_shards`` contiguous, disjoint ranges (the range
partitioner samples the key distribution, so shards are approximately
equal), and the within-partition sort makes each shard internally
ordered — together, reading shard 0..N sequentially replays the exact
global permutation. One shuffle, the inherent cost of a global
reorder. The manifest is built from parquet footer metadata
(driver-side, no data read).
"""

from __future__ import annotations

import json
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

SHUFFLE_KEY = "_shuffle_key"


def export_shuffled_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int,
    id_col: str = "doc_id",
) -> dict:
    """Write ``df`` as globally hash-shuffled parquet shards of
    ~``rows_per_shard`` rows; returns (and writes) the manifest."""
    n = df.count()
    n_shards = max(1, math.ceil(n / rows_per_shard))
    (
        df.withColumn(SHUFFLE_KEY, F.xxhash64(col(id_col)))
        .repartitionByRange(n_shards, col(SHUFFLE_KEY))
        .sortWithinPartitions(SHUFFLE_KEY)
        .drop(SHUFFLE_KEY)
        .write.mode("overwrite")
        .parquet(path)
    )

    import pyarrow.dataset as ds

    shards = sorted(
        (frag.path, sum(rg.num_rows for rg in frag.row_groups))
        for frag in ds.dataset(path, format="parquet").get_fragments()
    )
    manifest = {
        "total_rows": n,
        "n_shards": len(shards),
        "rows_per_shard_target": rows_per_shard,
        "shards": [{"path": p, "rows": r} for p, r in shards],
    }
    with open(f"{path}/_manifest.json", "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
