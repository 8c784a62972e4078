"""Multimodal plumbing tests: binary payload round-trip, Arrow batch
feature extraction, chunk fan-out consistency."""

from __future__ import annotations

import math

from conftest import TEST_SF_DIR
from hdb_resale_price_data_pipeline_spark.operators.multimodal import (
    documents_as_assets,
    extract_features,
    sample_chunks,
)
from hdb_resale_price_data_pipeline_spark.sources import read_table


def test_assets_schema_and_payload(spark):
    docs = read_table(spark, TEST_SF_DIR, "documents")
    assets = documents_as_assets(docs)
    assert [f.name for f in assets.schema.fields] == [
        "asset_id", "content", "media_type", "metadata",
    ]
    r = assets.filter("asset_id = 0").collect()[0]
    text = docs.filter("doc_id = 0").collect()[0].text
    assert bytes(r.content).decode("utf-8") == text  # payload round-trip


def test_extract_features_deterministic(spark):
    assets = documents_as_assets(read_table(spark, TEST_SF_DIR, "documents"))
    a = {r.asset_id: (r.f0, r.f1, r.f2, r.f3) for r in extract_features(assets).collect()}
    b = {r.asset_id: (r.f0, r.f1, r.f2, r.f3) for r in extract_features(assets).collect()}
    assert a == b
    assert all(0.0 <= v < 1.0 for feats in a.values() for v in feats)


def test_chunk_fanout_reassembles(spark):
    assets = documents_as_assets(read_table(spark, TEST_SF_DIR, "documents"))
    chunks = sample_chunks(assets, chunk_bytes=64)
    lens = {r.asset_id: r for r in assets.selectExpr("asset_id", "length(content) AS n").collect()}
    counts = {r.asset_id: r.cnt for r in chunks.groupBy("asset_id").count().withColumnRenamed("count", "cnt").collect()}
    for asset_id, row in lens.items():
        assert counts[asset_id] == math.ceil(row.n / 64)
    # byte-exact reassembly for one asset
    parts = sorted(
        (r.chunk_idx, bytes(r.chunk)) for r in chunks.filter("asset_id = 1").collect()
    )
    original = bytes(assets.filter("asset_id = 1").collect()[0].content)
    assert b"".join(p for _, p in parts) == original


def test_frame_sampling_caps_and_strides(spark):
    """sample_frames (r5): every 4th 32-byte frame, ≤8 per asset; the
    sampled bytes must equal direct payload slices and the cap must
    bind for long payloads."""
    from hdb_resale_price_data_pipeline_spark.operators.multimodal import (
        documents_as_assets,
        sample_frames,
    )
    from hdb_resale_price_data_pipeline_spark.sources import read_table

    docs = read_table(spark, TEST_SF_DIR, "documents").limit(60)
    frames = sample_frames(
        documents_as_assets(docs), frame_bytes=32, every_k=4, max_frames=8
    ).collect()
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    per_asset: dict = {}
    for r in frames:
        per_asset.setdefault(r.asset_id, []).append(r)
        assert r.frame_idx % 4 == 0
        want = texts[r.asset_id].encode()[r.frame_idx * 32 : (r.frame_idx + 1) * 32]
        assert bytes(r.frame) == want
    assert per_asset, "no frames sampled"
    for rows in per_asset.values():
        assert len(rows) <= 8
    long_assets = [d for d, t in texts.items() if len(t.encode()) > 32 * 4 * 8]
    for d in long_assets:
        assert len(per_asset[d]) == 8, "cap must bind on long payloads"
