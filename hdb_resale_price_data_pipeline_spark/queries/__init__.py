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
from . import dedup, events, extensions, relational, similarity, text, tpch_extra


def all_queries() -> dict[str, QuerySpec]:
    out: dict[str, QuerySpec] = {}
    for module in (relational, tpch_extra, events, dedup, text, similarity, extensions):
        overlap = out.keys() & module.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(module.QUERIES)
    return out


__all__ = ["QuerySpec", "all_queries"]
