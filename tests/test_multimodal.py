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
