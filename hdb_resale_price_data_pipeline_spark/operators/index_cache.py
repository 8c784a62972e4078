"""Bounded per-process cache for built ANN/LSH indexes.

The similarity queries build an index once per (session, dataset,
params) — a persisted DataFrame plus driver-side codebook — and probe it
many times. An unbounded dict of persisted frames is a storage-memory
leak in a long-lived session (each replaced dataset pins its executor
blocks forever); this cache caps entries and **unpersists every
DataFrame inside an evicted or replaced value**, so executor storage is
bounded by ``max_entries`` live indexes.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Hashable

from pyspark.sql import DataFrame

DEFAULT_MAX_ENTRIES = 4


class IndexCache:
    def __init__(self, max_entries: int = DEFAULT_MAX_ENTRIES) -> None:
        self.max_entries = max_entries
        self._data: OrderedDict[Hashable, Any] = OrderedDict()

    def get(self, key: Hashable) -> Any:
        value = self._data.get(key)
        if value is not None:
            self._data.move_to_end(key)  # LRU touch
        return value

    def put(self, key: Hashable, value: Any) -> Any:
        if key in self._data:
            self._release(self._data.pop(key))
        self._data[key] = value
        while len(self._data) > self.max_entries:
            _, evicted = self._data.popitem(last=False)
            self._release(evicted)
        return value

    def clear(self) -> None:
        while self._data:
            _, evicted = self._data.popitem(last=False)
            self._release(evicted, destroy=True)

    def __len__(self) -> int:
        return len(self._data)

    @staticmethod
    def _release(value: Any, destroy: bool = False) -> None:
        from pyspark import Broadcast

        parts = value if isinstance(value, (tuple, list)) else (value,)
        for part in parts:
            if isinstance(part, DataFrame):
                try:
                    part.unpersist()
                except Exception:
                    pass  # session already stopped — nothing to release
            elif isinstance(part, Broadcast):
                # Broadcast variables (e.g. the Bloom bitset) pin
                # executor+driver memory. LRU eviction must UNPERSIST,
                # not destroy: a still-unexecuted (or retained) plan that
                # captured the evicted broadcast re-fetches lazily from
                # the driver after unpersist but fails hard after
                # destroy. destroy() is reserved for clear() — explicit
                # session teardown, where no pending plan may outlive it.
                # The driver-side payload an unpersisted broadcast keeps
                # is NOT leaked for the session lifetime: eviction drops
                # this cache's strong reference, and Spark's
                # ContextCleaner destroys garbage-collected broadcasts
                # automatically (weak-ref tracking) once no plan holds
                # them either.
                try:
                    part.destroy() if destroy else part.unpersist()
                except Exception:
                    pass
