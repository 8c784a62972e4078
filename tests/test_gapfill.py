"""Gap fill (events_gap_fill) semantics beyond the oracle match:
calendar contiguity, forward-fill carry, and trend-OLS slope sanity
against an independent numpy fit."""

from __future__ import annotations

import datetime as dt

import numpy as np

from conftest import TEST_SF_DIR

from hdb_resale_price_data_pipeline_spark.queries.events import (
    q_events_gap_fill,
)
from hdb_resale_price_data_pipeline_spark.queries.relational import (
    q_customers_trend_ols,
)


def test_gap_fill_calendar_and_carry(spark):
    pdf = q_events_gap_fill(spark, TEST_SF_DIR).toPandas()
    pdf["d"] = pdf["day"].map(dt.date.fromisoformat)
    assert len(pdf) > 0
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values("d").reset_index(drop=True)
        # contiguous calendar: row count == span, no duplicate days
        span = (g["d"].iloc[-1] - g["d"].iloc[0]).days + 1
        assert len(g) == span, uid
        assert g["d"].is_unique
        # first and last day of the span are observed by construction
        assert g["is_gap"].iloc[0] == 0 and g["is_gap"].iloc[-1] == 0
        # forward-fill: on a gap day the filled value carries the
        # previous row's; on an observed day it re-anchors
        prev = None
        for _, row in g.iterrows():
            if row["is_gap"]:
                assert row["filled_cents"] == prev, uid
            prev = row["filled_cents"]
        assert g["filled_cents"].notna().all()


def test_gap_fill_has_gaps(spark):
    # the probe is only meaningful if the testdata actually has gaps
    pdf = q_events_gap_fill(spark, TEST_SF_DIR).toPandas()
    assert int(pdf["is_gap"].sum()) > 0


def test_trend_ols_matches_numpy(spark, duck):
    got = {
        int(r.o_custkey): r
        for r in q_customers_trend_ols(spark, TEST_SF_DIR).collect()
    }
    monthly = duck.execute(
        """
        SELECT o_custkey,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) x,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) y
        FROM orders GROUP BY 1, 2
        """
    ).fetchdf()
    checked = 0
    for cust, g in monthly.groupby("o_custkey"):
        if int(cust) % 101 != 0:  # spot-check a deterministic sample
            continue
        row = got[int(cust)]
        assert row.n_months == len(g)
        if len(g) < 2 or g["x"].nunique() < 2:
            assert row.trend == "insufficient"
            continue
        slope = np.polyfit(
            g["x"].to_numpy(dtype=float), g["y"].to_numpy(dtype=float), 1
        )[0]
        assert abs(row.slope_q / 1e6 - slope) < 1e-3, cust
        checked += 1
    assert checked > 0
