#!/usr/bin/env python3
"""Spark Connect compatibility sweep (sandbox approximation).

This container has no grpcio/protobuf, so a REAL Connect session
(``SparkSession.builder.remote(...)``) cannot start and nothing may be
installed. The closest honest approximation — the one the round-4
review asked for — is to make the classic session's gateway surface
(``sparkContext`` / ``_jvm`` / ``_jsc`` / ``_sc``) raise
``AttributeError`` exactly as a Connect client would, but ONLY when the
access comes from a frame inside this package. PySpark's own internals
(a different module tree) keep their gateway, so DataFrame execution
still works — what the sweep audits is OUR call sites: every package
path must either avoid the gateway or take its documented Connect
fallback (``getattr(spark, "_jvm", None)`` guards, ``try: spark.
sparkContext except``).

``AttributeError`` specifically: ``getattr(obj, name, default)`` only
swallows AttributeError, so the package's existing ``getattr`` guards
behave under this patch exactly as on a real Connect client (attribute
"missing" → fallback path), while an UNGUARDED touch fails loudly with
a [connect-sweep] message naming the offending module.

Usage: ``SPARK_GRAFT_CONNECT_SWEEP=1 python -m pytest tests/ -q``
(tests/conftest.py installs the guard before the session fixture).
Results are recorded per-module in COVERAGE.md.
"""

from __future__ import annotations

import inspect

PKG = "hdb_resale_price_data_pipeline_spark"

_GUARDED_ATTRS = ("sparkContext", "_jvm", "_jsc", "_sc")


def _caller_module() -> str:
    frame = inspect.currentframe()
    # f_back of the getter = the attribute access site (getattr() and
    # the . operator create no Python frame of their own)
    caller = frame.f_back.f_back if frame and frame.f_back else None
    return caller.f_globals.get("__name__", "") if caller else ""


def _guard_attr(cls, name: str) -> None:
    orig = None
    for klass in cls.__mro__:
        if name in klass.__dict__:
            orig = klass.__dict__[name]
            break
    store = f"_connect_sweep_store_{name}"

    def getter(self):
        mod = _caller_module()
        if mod.startswith(PKG):
            raise AttributeError(
                f"[connect-sweep] SparkSession.{name} accessed from {mod} — "
                "a Spark Connect client has no gateway; guard or use the "
                "documented fallback"
            )
        if isinstance(orig, property):
            return orig.fget(self)
        if store in self.__dict__:
            return self.__dict__[store]
        raise AttributeError(name)

    def setter(self, value):
        # classic __init__ assigns _jvm/_jsc/_sc as instance attributes;
        # the data-descriptor property shadows the instance dict, so
        # park them under an alias key
        self.__dict__[store] = value

    setattr(cls, name, property(getter, setter))


def install_connect_guard() -> None:
    """Idempotently install the package-scoped gateway guard on the
    classic SparkSession class."""
    from pyspark.sql.session import SparkSession

    if getattr(SparkSession, "_connect_sweep_installed", False):
        return
    for name in _GUARDED_ATTRS:
        _guard_attr(SparkSession, name)
    SparkSession._connect_sweep_installed = True
