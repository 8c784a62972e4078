"""Z-order layout: key correctness vs a reference Morton encoding, and
measured row-group pruning beating linear-sort/natural layouts on a
2-D box filter."""

from __future__ import annotations

import shutil

from conftest import TEST_SF_DIR
from pyspark.sql import functions as F

from hdb_resale_price_data_pipeline_spark.sources import read_table
from hdb_resale_price_data_pipeline_spark.sources.layout import (
    rowgroup_prune_fraction,
    write_zordered,
    zorder_key,
)


def _morton(vals: list[int], bits: int) -> int:
    out = 0
    for i, v in enumerate(vals):
        for j in range(bits):
            out |= ((v >> j) & 1) << (j * len(vals) + i)
    return out


def test_zorder_key_matches_reference_morton(spark):
    # Columns already in [0, 2^bits): the scaling is identity, so the
    # expression must equal the reference bit-interleave exactly.
    bits = 4
    top = (1 << bits) - 1
    rows = [(a, b) for a in (0, 1, 5, top) for b in (0, 3, 7, top)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", zorder_key(df, ["a", "b"], bits)).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _morton([a, b], bits), (a, b)


def test_zorder_constant_column_is_safe(spark):
    df = spark.createDataFrame([(1, 7), (2, 7), (3, 7)], "a int, b int")
    zs = [r.z for r in df.withColumn("z", zorder_key(df, ["a", "b"], 4)).collect()]
    assert zs == sorted(zs)  # degenerate dim contributes 0 bits, a still orders


def test_zorder_layout_prunes_2d_box(spark, tmp_path):
    li = read_table(spark, TEST_SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    lo_o, hi_o, lo_p, hi_p = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.min("l_partkey"), F.max("l_partkey")
    ).first()
    # ~10% box on both dimensions, placed at 10-20%: inside one z-curve
    # quadrant. (A box straddling the 50% mark sits on the curve's
    # top-level discontinuity — the known worst case for Morton
    # locality — and with only 8 row groups the skippable fraction
    # then flaps around any threshold.)
    box = {
        "l_orderkey": (lo_o + 0.10 * (hi_o - lo_o), lo_o + 0.20 * (hi_o - lo_o)),
        "l_partkey": (lo_p + 0.10 * (hi_p - lo_p), lo_p + 0.20 * (hi_p - lo_p)),
    }
    natural = f"{tmp_path}/natural"
    zordered = f"{tmp_path}/zorder"
    # natural: same file count, deterministically UNclustered (scatter by
    # a hash of the key — plain repartition(n) round-robins batches and
    # can accidentally preserve source clustering)
    li.repartition(8, F.crc32(F.col("l_orderkey").cast("string"))).write.mode(
        "overwrite"
    ).parquet(natural)
    write_zordered(li, zordered, ["l_orderkey", "l_partkey"], n_files=8)
    try:
        f_nat = rowgroup_prune_fraction(natural, box)
        f_z = rowgroup_prune_fraction(zordered, box)
        # row counts must be identical — layout is a rewrite, not a filter
        assert (
            spark.read.parquet(zordered).count() == li.count()
        )
        assert f_nat < 0.25  # hash layout: stats span everything
        assert f_z >= 0.5  # z-order: most row groups skippable
        assert f_z > f_nat
    finally:
        shutil.rmtree(natural, ignore_errors=True)
        shutil.rmtree(zordered, ignore_errors=True)


def test_hilbert_index_is_a_continuous_bijection():
    """The two defining curve properties on a full 8x8 grid: every cell
    gets a distinct position (bijection), and consecutive positions are
    grid-adjacent (continuity — the property Morton lacks, and the
    reason Hilbert runs span tighter boxes)."""
    import numpy as np

    from hdb_resale_price_data_pipeline_spark.sources.layout import (
        _hilbert_index_np,
    )

    bits = 3
    n = 1 << bits
    xx, yy = np.meshgrid(np.arange(n), np.arange(n))
    x, y = xx.ravel(), yy.ravel()
    d = _hilbert_index_np(x, y, bits)
    assert sorted(d) == list(range(n * n))
    order = np.argsort(d)
    steps = np.abs(np.diff(x[order])) + np.abs(np.diff(y[order]))
    assert (steps == 1).all()


def test_hilbert_layout_prunes_2d_box(spark, tmp_path):
    """Hilbert clustering must prune a 2-D box at least as well as the
    unclustered baseline by a wide margin; the box deliberately straddles
    the 50% mark — Morton's worst case, which Hilbert has no analog of."""
    from hdb_resale_price_data_pipeline_spark.sources.layout import (
        write_hilbert_ordered,
    )

    li = read_table(spark, TEST_SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    lo_o, hi_o, lo_p, hi_p = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.min("l_partkey"), F.max("l_partkey")
    ).first()
    box = {
        "l_orderkey": (lo_o + 0.45 * (hi_o - lo_o), lo_o + 0.55 * (hi_o - lo_o)),
        "l_partkey": (lo_p + 0.45 * (hi_p - lo_p), lo_p + 0.55 * (hi_p - lo_p)),
    }
    hilbert = f"{tmp_path}/hilbert"
    write_hilbert_ordered(li, hilbert, ["l_orderkey", "l_partkey"], n_files=8)
    try:
        assert spark.read.parquet(hilbert).count() == li.count()
        f_h = rowgroup_prune_fraction(hilbert, box)
        assert f_h >= 0.5
    finally:
        shutil.rmtree(hilbert, ignore_errors=True)
