"""Multi-dimensional data layout (z-order clustering) for scan pruning.

At 100 TB the cheapest query is the one that never reads the data:
parquet row-group min/max statistics let a filtered scan skip row
groups whose [min, max] range can't match. A linear sort clusters ONE
dimension perfectly and leaves every other dimension unsorted; a
Morton (z-order) key interleaves the bits of several dimensions so a
range predicate on ANY of them maps to a bounded set of z-ranges —
2-D box filters prune on both dimensions at once. This is the same
layout trick Delta's OPTIMIZE ZORDER BY and ClickHouse's
``mortonEncode`` keys use; here it's plain Spark: compute the key,
``repartitionByRange`` on it (range partitioner → globally clustered
files), sort within partitions, write parquet.

The z-key is a pure codegen expression (shifts/masks over scaled
BIGINT ranks — no UDF): each column is min/max-scaled to ``bits`` bits
(one tiny agg job collects the bounds), then bit j of column i lands
at interleaved position ``j * n_cols + i``.

Measured (tools/scale_probe.py --layout, lineitem sf0.1 ×16, ~10%
range filters on (l_orderkey, l_partkey), 32 row groups): skippable
row groups by footer stats —

    layout                        dim1-only   dim2-only   2-D box
    natural (hash)                    0%          0%         0%
    linear sort on dim1              81%          0%        81%
    zorder(dim1, dim2)               41%         66%        78%
    hilbert(dim1, dim2)              56%         69%        88%

i.e. the z-order trades some single-dimension pruning for useful
pruning on EVERY interleaved dimension — the layout to pick when the
workload filters on more than one column. The Hilbert variant
(:func:`hilbert_key`) prunes strictly better than Morton on every
case measured: the curve is continuous (no power-of-two jumps), so
each file's rows span a tighter (x, y) box and footer min/max stats
are tighter. Its key needs an Arrow UDF rather than a codegen
expression — a fair trade on a one-time layout rewrite.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, pandas_udf


def _scale_expr(c: str, lo: float, hi: float, bits: int) -> str:
    """Scale a numeric column to an integer in [0, 2^bits): codegen
    arithmetic, monotone, so range predicates survive the mapping."""
    top = (1 << bits) - 1
    if hi <= lo:
        return "CAST(0 AS BIGINT)"
    return (
        f"CAST(least(greatest((CAST({c} AS DOUBLE) - {lo!r}) / ({hi!r} - {lo!r}), 0.0),"
        f" 1.0) * {top} AS BIGINT)"
    )


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 12) -> Column:
    """Morton key over ``cols``: one agg job for per-column min/max,
    then a single interleaved-bits BIGINT expression.

    ``bits`` per dimension; total key width = bits × n_cols must stay
    ≤ 63. Default 12 bits × up to 5 dims — plenty: the key only has to
    order data at row-group granularity, not distinguish every row.
    """
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} cols exceeds BIGINT")
    bounds = df.agg(
        *[F.min(col(c).cast("double")).alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(col(c).cast("double")).alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).first()
    scaled = [
        _scale_expr(c, float(getattr(bounds, f"lo_{i}")), float(getattr(bounds, f"hi_{i}")), bits)
        for i, c in enumerate(cols)
    ]
    terms = []
    for i, s in enumerate(scaled):
        for j in range(bits):
            # bit j of column i → interleaved position j*n_cols + i
            terms.append(f"shiftleft(shiftright({s}, {j}) & 1, {j * len(cols) + i})")
    return F.expr(" + ".join(terms))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 32,
    bits: int = 12,
) -> None:
    """Write ``df`` as parquet clustered on the z-order of ``cols``.

    ``repartitionByRange`` on the z-key gives globally disjoint key
    ranges per file (one shuffle — the layout job's inherent cost);
    the within-partition sort tightens row-group min/max stats. The
    helper column never reaches the files.
    """
    z = zorder_key(df, cols, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def _hilbert_index_np(x, y, bits: int):
    """Vectorized 2-D Hilbert curve index (grid cell → position along
    the curve), the classic xy2d bit-rotation loop over numpy arrays.

    Unlike the Morton key this cannot be a single codegen expression
    (each of the ``bits`` iterations conditionally swaps/flips state),
    so it runs as an Arrow-batched numpy loop — ``bits`` vectorized
    passes per batch, fine for a one-time layout rewrite."""
    import numpy as np

    x = x.astype(np.int64, copy=True)
    y = y.astype(np.int64, copy=True)
    d = np.zeros_like(x)
    s = 1 << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate the quadrant so the sub-curve orientation matches
        swap = ry == 0
        flip = swap & (rx == 1)
        xf = np.where(flip, s - 1 - x, x)
        yf = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        s >>= 1
    return d


def hilbert_key(df: DataFrame, cols: Sequence[str], bits: int = 12) -> Column:
    """Hilbert-curve clustering key over two numeric columns.

    Same min/max scaling as :func:`zorder_key`; the curve index itself
    is an Arrow-vectorized pandas_udf. A Hilbert curve is continuous —
    consecutive curve positions are always grid-adjacent, where the
    Morton curve jumps across the space at every power-of-two boundary
    — so runs of rows in one file span tighter (x, y) boxes and footer
    min/max stats prune slightly better on 2-D box filters (measured:
    see module docstring table)."""
    if len(cols) != 2:
        raise ValueError("hilbert_key supports exactly 2 dimensions")
    bounds = df.agg(
        *[F.min(col(c).cast("double")).alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(col(c).cast("double")).alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).first()
    scaled = [
        F.expr(
            _scale_expr(
                c,
                float(getattr(bounds, f"lo_{i}")),
                float(getattr(bounds, f"hi_{i}")),
                bits,
            )
        )
        for i, c in enumerate(cols)
    ]

    @pandas_udf("bigint")
    def _hilbert(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            _hilbert_index_np(x.to_numpy(), y.to_numpy(), bits)
        )

    return _hilbert(scaled[0], scaled[1])


def write_hilbert_ordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 32,
    bits: int = 12,
) -> None:
    """Write ``df`` as parquet clustered along a 2-D Hilbert curve —
    same shuffle/sort shape as :func:`write_zordered`."""
    h = hilbert_key(df, cols, bits)
    (
        df.withColumn("_h", h)
        .repartitionByRange(n_files, col("_h"))
        .sortWithinPartitions("_h")
        .drop("_h")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_prune_fraction(path: str, predicates: dict[str, tuple[float, float]]) -> float:
    """Fraction of parquet row groups a box filter could SKIP, judged
    from footer min/max stats alone (the same decision a scan makes).
    Diagnostic for layout quality — driver-side, reads only footers."""
    import pyarrow.dataset as ds

    total = 0
    skippable = 0
    for frag in ds.dataset(path, format="parquet").get_fragments():
        for rg in frag.row_groups:
            total += 1
            stats_miss = False
            for c, (lo, hi) in predicates.items():
                s = rg.statistics.get(c)
                if s is None or s.get("min") is None:
                    continue
                if s["min"] > hi or s["max"] < lo:
                    stats_miss = True
                    break
            if stats_miss:
                skippable += 1
    return skippable / total if total else 0.0
