"""SCD2 merge emulation tests (warehouse history semantics)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from hdb_resale_price_data_pipeline_spark.operators.scd import scd2_apply

D1 = datetime.date(2024, 10, 1)
D2 = datetime.date(2024, 11, 1)

SCHEMA = "url string, price int, floor string, valid_from date, valid_to date"


def test_scd2_apply(spark):
    history = spark.createDataFrame(
        [
            ("u1", 500000, "high", D1, None),   # will change price
            ("u2", 600000, "low", D1, None),    # unchanged
            ("u3", 700000, "middle", D1, None), # absent from batch → stays open
        ],
        SCHEMA,
    )
    changes = spark.createDataFrame(
        [
            ("u1", 520000, "high"),  # price changed
            ("u2", 600000, "low"),   # identical → no new version
            ("u4", 450000, "low"),   # brand new key
        ],
        "url string, price int, floor string",
    )
    out = scd2_apply(history, changes, key="url", compare_cols=["price", "floor"], as_of=D2)
    rows = {(r.url, r.valid_from, r.valid_to): r for r in out.collect()}

    assert rows[("u1", D1, D2)].price == 500000       # closed old version
    assert rows[("u1", D2, None)].price == 520000     # new open version
    assert rows[("u2", D1, None)].price == 600000     # untouched
    assert rows[("u3", D1, None)].price == 700000     # untouched (absent)
    assert rows[("u4", D2, None)].price == 450000     # insert
    assert len(rows) == 5

    # idempotence: re-applying the same batch changes nothing
    again = scd2_apply(out, changes, key="url", compare_cols=["price", "floor"], as_of=datetime.date(2024, 12, 1))
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))


def test_scd2_null_safe_compare(spark):
    history = spark.createDataFrame([("u1", None, "low", D1, None)], SCHEMA)
    changes = spark.createDataFrame([("u1", None, "low")], "url string, price int, floor string")
    out = scd2_apply(history, changes, key="url", compare_cols=["price", "floor"], as_of=D2)
    assert out.count() == 1  # NULL == NULL must not register as a change
