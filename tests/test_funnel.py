"""Funnel + cohort retention (pipeline/funnel.py)."""

from datetime import datetime as dt

import pytest
from pyspark.sql import functions as F

from zef_spark.pipeline.funnel import (cohort_retention, funnel_counts,
                                       funnel_users)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1 completes view -> click -> purchase in order
        (1, dt(2024, 1, 1, 10), "view"),
        (1, dt(2024, 1, 1, 11), "click"),
        (1, dt(2024, 1, 1, 12), "purchase"),
        # u2 clicks BEFORE viewing: click must not count; no purchase
        (2, dt(2024, 1, 2, 9), "click"),
        (2, dt(2024, 1, 2, 10), "view"),
        # u3 views only
        (3, dt(2024, 1, 3, 8), "view"),
        # u4 completes but the purchase is 10 days after the view
        (4, dt(2024, 1, 1, 8), "view"),
        (4, dt(2024, 1, 1, 9), "click"),
        (4, dt(2024, 1, 11, 9), "purchase"),
        # u4 active again in week 3 (cohort retention)
        (4, dt(2024, 1, 16, 9), "view"),
        # u5 never views
        (5, dt(2024, 1, 5, 7), "purchase"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string")


def test_funnel_counts_ordered(events):
    out = {r["step"]: r for r in
           funnel_counts(events, ["view", "click", "purchase"]).collect()}
    assert out[0]["n_users"] == 4          # u1 u2 u3 u4 viewed
    # u1 and u4 clicked strictly after their first view; u2's click
    # predates the view and must NOT count
    assert out[1]["n_users"] == 2
    assert out[1]["step_name"] == "click"
    assert out[2]["n_users"] == 2          # u1, u4 purchased after click


def test_funnel_users_timestamps(events):
    rows = funnel_users(events, ["view", "click", "purchase"]).collect()
    by_user = {r["user_id"]: r for r in rows}
    assert set(by_user) == {1, 4}
    assert by_user[1]["t0"] == dt(2024, 1, 1, 10)
    assert by_user[1]["t2"] == dt(2024, 1, 1, 12)


def test_funnel_within_horizon(events):
    out = {r["step"]: r["n_users"] for r in
           funnel_counts(events, ["view", "click", "purchase"],
                         within_seconds=86400).collect()}
    assert out[2] == 1                     # u4's purchase is outside 24h


def test_cohort_retention(events):
    got = {(str(r["cohort_week"]), r["week_offset"]): r["n_users"]
           for r in cohort_retention(events).collect()}
    # 2024-01-01 is a Monday: u1-u5 all first-seen in week 2024-01-01
    assert got[("2024-01-01", 0)] == 5
    # u4 active in week of Jan 8 (purchase on the 11th) and Jan 15
    assert got[("2024-01-01", 1)] == 1
    assert got[("2024-01-01", 2)] == 1
