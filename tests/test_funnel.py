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


def test_attribution_models_conserve_credit(spark):
    """Σcredit == Σ converted value in every model; last/first touch
    pick the right view; linear splits equally; horizon excludes
    stale touches (they fall to the direct bucket)."""
    import datetime as dt
    from zef_spark.pipeline.funnel import attribution
    t0 = dt.datetime(2024, 1, 1)
    s = lambda x: t0 + dt.timedelta(seconds=x)
    rows = [
        (1, s(0), "view", 0.0), (1, s(10), "view", 0.0),
        (1, s(20), "purchase", 100.0),
        (2, s(0), "view", 0.0), (2, s(90000), "purchase", 50.0),
        (3, s(5), "purchase", 30.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string, "
              "value double")
    kw = dict(touch_type="view", convert_type="purchase",
              horizon_seconds=3600)
    last = attribution(ev, "ts", "user_id", "event_type", "value",
                       model="last_touch", **kw).collect()
    by_user = {r["user"]: r for r in last}
    assert by_user[1]["touch_ts"] == s(10)
    assert by_user[2]["touch_ts"] is None      # outside horizon
    assert by_user[3]["touch_ts"] is None      # no view at all
    assert sum(r["credit"] for r in last) == 180.0

    first = attribution(ev, "ts", "user_id", "event_type", "value",
                        model="first_touch", **kw).collect()
    assert {r["user"]: r["touch_ts"] for r in first}[1] == s(0)

    lin = attribution(ev, "ts", "user_id", "event_type", "value",
                      model="linear", **kw).collect()
    u1 = [r for r in lin if r["user"] == 1]
    assert len(u1) == 2 and all(r["credit"] == 50.0 for r in u1)
    assert abs(sum(r["credit"] for r in lin) - 180.0) < 1e-9

    import pytest
    with pytest.raises(ValueError, match="horizon"):
        attribution(ev, "ts", "user_id", "event_type", "value",
                    model="linear")
    with pytest.raises(ValueError, match="model"):
        attribution(ev, "ts", "user_id", "event_type", "value",
                    model="nope", horizon_seconds=10)


def test_attribution_first_touch_within_horizon(spark):
    """ADVICE r06: first_touch + horizon credits the EARLIEST touch
    inside the lookback window — a user whose first-ever touch is
    stale but who has a fresh touch must not fall to direct."""
    import datetime as dt
    from zef_spark.pipeline.funnel import attribution
    t0 = dt.datetime(2024, 1, 1)
    s = lambda x: t0 + dt.timedelta(seconds=x)
    ev = spark.createDataFrame(
        [(1, s(0), "view", 0.0),        # stale: 7000 s before conv
         (1, s(4600), "view", 0.0),     # inside horizon (2400 s old)
         (1, s(5000), "view", 0.0),     # inside horizon (2000 s old)
         (1, s(7000), "purchase", 10.0)],
        "user_id long, ts timestamp_ntz, event_type string, "
        "value double")
    first = attribution(ev, "ts", "user_id", "event_type", "value",
                        touch_type="view", convert_type="purchase",
                        model="first_touch",
                        horizon_seconds=3600).collect()
    assert len(first) == 1 and first[0]["touch_ts"] == s(4600)
    last = attribution(ev, "ts", "user_id", "event_type", "value",
                       touch_type="view", convert_type="purchase",
                       model="last_touch",
                       horizon_seconds=3600).collect()
    assert last[0]["touch_ts"] == s(5000)
    # horizon lower bound is inclusive: a touch exactly horizon
    # seconds before the conversion is still credited
    edge = attribution(ev, "ts", "user_id", "event_type", "value",
                       touch_type="view", convert_type="purchase",
                       model="first_touch",
                       horizon_seconds=2400).collect()
    assert edge[0]["touch_ts"] == s(4600)


def test_concurrency_profile_two_phase_prefix_sum(spark):
    """The distributed sweep equals the obvious single-window sweep,
    including the half-open convention (end == start of another
    interval does not overlap)."""
    import datetime as dt
    from zef_spark.pipeline.rollup import concurrency_profile
    t0 = dt.datetime(2024, 1, 1)
    s = lambda m: t0 + dt.timedelta(minutes=m)
    iv = spark.createDataFrame(
        [(s(0), s(90)), (s(30), s(60)), (s(60), s(120)),
         (s(200), s(210))],
        "a timestamp_ntz, b timestamp_ntz")
    out = {r["bucket"]: r["max_concurrency"]
           for r in concurrency_profile(iv, "a", "b", "1 hour",
                                        n_ranges=4).collect()}
    # hour 0: [0,90) and [30,60) and [60,120): at t=30 conc=2; at
    # t=60 the second ends before the third starts -> still 2
    assert out[t0] == 2
    assert out[t0 + dt.timedelta(hours=1)] == 2   # 90 end, 60 start alive
    assert out[t0 + dt.timedelta(hours=3)] == 1
    # hour 2 ([120,180)): level is 0 throughout -> absent, not a 0-row
    assert t0 + dt.timedelta(hours=2) not in out


def test_concurrency_profile_carried_and_interior(spark):
    """ADVICE r06: (a) a bucket whose only delta is a −1 still
    reports the level carried in at bucket start; (b) buckets lying
    wholly inside a long interval are gap-filled from the running
    level, not silently read as 0."""
    import datetime as dt
    from zef_spark.pipeline.rollup import concurrency_profile
    t0 = dt.datetime(2024, 1, 1)
    s = lambda m: t0 + dt.timedelta(minutes=m)
    h = lambda k: t0 + dt.timedelta(hours=k)
    # one 5-hour interval + a short one ending mid-hour-1
    iv = spark.createDataFrame(
        [(s(0), s(300)), (s(10), s(70))],
        "a timestamp_ntz, b timestamp_ntz")
    out = {r["bucket"]: r["max_concurrency"]
           for r in concurrency_profile(iv, "a", "b", "1 hour",
                                        n_ranges=3).collect()}
    assert out[h(0)] == 2                 # both open at [10,60)
    assert out[h(1)] == 2                 # carried-in 2 until t=70
    assert out[h(2)] == 1 and out[h(3)] == 1 and out[h(4)] == 1
    assert h(5) not in out                # ends exactly at 300 (half-open)
    # zero-width interval occupies nothing
    z = spark.createDataFrame([(s(0), s(0))],
                              "a timestamp_ntz, b timestamp_ntz")
    assert concurrency_profile(z, "a", "b", "1 hour").count() == 0


def test_event_transitions_counts_and_probs(spark):
    import datetime as dt
    from zef_spark.pipeline.funnel import event_transitions
    t0 = dt.datetime(2024, 1, 1)
    s = lambda x: t0 + dt.timedelta(seconds=x)
    ev = spark.createDataFrame(
        [(1, s(0), "a"), (1, s(1), "b"), (1, s(2), "a"),
         (2, s(0), "a"), (2, s(1), "b")],
        "user_id long, ts timestamp_ntz, event_type string")
    out = {(r["prev"], r["next"]): (r["n"], r["p"])
           for r in event_transitions(ev).collect()}
    assert out[("a", "b")] == (2, 1.0)     # a always followed by b
    assert out[("b", "a")] == (1, 1.0)     # the only b-successor
    assert ("a", "a") not in out           # never adjacent
    # cross-user boundaries never pair up
    assert sum(n for n, _ in out.values()) == 3


def test_session_paths_order_and_cap(spark):
    import datetime as dt
    from zef_spark.pipeline.funnel import session_paths
    t0 = dt.datetime(2024, 1, 1)
    s = lambda x: t0 + dt.timedelta(seconds=x)
    rows = ([(1, s(i), i, f"e{i}") for i in range(7)]          # 1 session
            + [(1, s(10000), 99, "z")]                          # new session
            + [(2, s(0), 0, "a")])
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, "
              "event_type string")
    out = {r["path"]: r["n_sessions"]
           for r in session_paths(ev, gap_seconds=1800, max_len=5,
                                  tiebreak_col="event_id").collect()}
    assert out["e0>e1>e2>e3>e4"] == 1      # capped at 5, in order
    assert out["z"] == 1 and out["a"] == 1


def test_funnel_time_stats_exact_gaps(spark):
    import datetime as dt
    from zef_spark.pipeline.funnel import funnel_time_stats
    t0 = dt.datetime(2024, 1, 1)
    s = lambda x: t0 + dt.timedelta(seconds=x)
    rows = []
    # three completers with step gaps (a->b, b->c):
    #   u1: 10s, 100s; u2: 20s, 200s; u3: 30s, 300s
    for u, (g1, g2) in enumerate([(10, 100), (20, 200), (30, 300)],
                                 start=1):
        rows += [(u, s(0), "a"), (u, s(g1), "b"), (u, s(g1 + g2), "c")]
    rows += [(9, s(0), "a"), (9, s(5), "b")]      # drops before c
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string")
    out = {r["step"]: r for r in funnel_time_stats(
        ev, ["a", "b", "c"]).collect()}
    assert set(out) == {1, 2}
    # only the 3 completers count (user 9 excluded from BOTH steps)
    assert out[1]["n"] == 3 and out[2]["n"] == 3
    # PERCENTILE_DISC: p50 = value at ceil(.5*3)=2nd of sorted
    assert out[1]["p50"] == 20.0 and out[2]["p50"] == 200.0
    assert out[1]["p90"] == 30.0 and out[2]["p90"] == 300.0
    assert out[1]["mean_seconds"] == 20.0
    assert out[2]["mean_seconds"] == 200.0
