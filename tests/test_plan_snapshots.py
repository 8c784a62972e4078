"""Plan-shape regression gate: every registered query's physical plan
must keep the operator signature committed in plan_snapshots.json.

This catches silent plan degradation — a broadcast flipping to
SortMergeJoin when a dim outgrows the threshold heuristic, an extra
exchange from a lost partitioning, a codegen expression dropping to a
Python eval — which sf0.01 timings cannot see. After an INTENTIONAL
plan change, regenerate with

    python tools/plan_snapshot.py --update

and review the JSON diff.
"""

from __future__ import annotations

import json
import os

import pytest

from conftest import TEST_SF_DIR
from hdb_resale_price_data_pipeline_spark.queries import local_queries

from tools.plan_snapshot import SNAPSHOT_PATH, plan_signature, warm_index_caches

with open(SNAPSHOT_PATH) as f:
    SNAPSHOTS = json.load(f)

REGISTRY = local_queries()


@pytest.fixture(scope="module", autouse=True)
def _warm(spark):
    # snapshots are taken in the warm-index steady state (see
    # tools/plan_snapshot.warm_index_caches)
    warm_index_caches(spark, TEST_SF_DIR)


def test_snapshot_file_covers_exactly_the_registry():
    assert sorted(SNAPSHOTS) == sorted(REGISTRY), (
        "registry and plan_snapshots.json diverged — run "
        "`python tools/plan_snapshot.py --update`"
    )


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_plan_signature_unchanged(name, spark):
    got = plan_signature(REGISTRY[name].fn(spark, TEST_SF_DIR))
    assert got == SNAPSHOTS[name], (
        f"{name}: plan shape drifted from snapshot.\n"
        f"  snapshot: {SNAPSHOTS[name]}\n"
        f"  current:  {got}\n"
        "If intentional: python tools/plan_snapshot.py --update"
    )
