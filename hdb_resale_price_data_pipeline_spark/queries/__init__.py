"""Driver-facing query registry.

Every implemented operator from SURVEY.md §2 (plus the beyond-reference
LLM-pipeline operators) is registered here as a named ``QuerySpec``:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark implementation,
- ``oracle`` — equivalent DuckDB SQL over the driver's pre-registered
  views (``region nation customer supplier part orders lineitem events
  documents embeddings``), or ``None`` for non-SQL-expressible ops
  (streaming) → driver records a rows-only check.

Column names are aliased identically on both sides — the driver's
comparison sorts columns by name before value-hashing.
"""

from __future__ import annotations

from .base import QuerySpec
from . import (
    dedup,
    er,
    events,
    extensions,
    privacy,
    profiling,
    relational,
    similarity,
    text,
    tpch_extra,
)

# Driver-graded registration order. The driver's correctness gate checks
# the FIRST 50 entries only, so the registry is capped at 50 (near-
# duplicate demos are merged or demoted to per-module LOCAL_QUERIES,
# which tests/test_correctness.py still verifies). Families are ordered
# so that if the window ever shrinks, the most redundant entries
# (tpch_extra) fall off first.
_GRADED_MODULES = (
    relational,
    profiling,
    events,
    dedup,
    text,
    similarity,
    extensions,
    er,
    privacy,
    tpch_extra,
)

# Hard cap matching the driver's correctness window: every registered
# query must receive a CORRECTNESS entry.
DRIVER_WINDOW = 50


def all_queries() -> dict[str, QuerySpec]:
    out: dict[str, QuerySpec] = {}
    for module in _GRADED_MODULES:
        overlap = out.keys() & module.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(module.QUERIES)
    if len(out) > DRIVER_WINDOW:
        raise ValueError(
            f"registry has {len(out)} entries but the driver grades only the "
            f"first {DRIVER_WINDOW}; merge or demote queries to LOCAL_QUERIES"
        )
    return out


def local_queries() -> dict[str, QuerySpec]:
    """Graded registry plus per-module LOCAL_QUERIES — the superset the
    local test suite verifies against DuckDB oracles."""
    out = all_queries()
    for module in _GRADED_MODULES:
        extra = getattr(module, "LOCAL_QUERIES", {})
        overlap = out.keys() & extra.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(extra)
    return out


__all__ = ["QuerySpec", "all_queries", "local_queries", "DRIVER_WINDOW"]
