"""Funnel + retention analytics (ops/funnel.py)."""

from __future__ import annotations

import datetime as dt

from rdf_tabular_spark.ops.funnel import (funnel_conversions,
                                          funnel_counts,
                                          retention_cohorts)


def _ts(s):
    return dt.datetime.fromisoformat(s)


EVENTS = [
    # u1: full ordered funnel
    (1, "view", "2024-01-01 10:00:00"),
    (1, "click", "2024-01-01 11:00:00"),
    (1, "purchase", "2024-01-01 12:00:00"),
    # u2: clicked BEFORE viewing — click must not count (order strict),
    # but a later click rescues the funnel
    (2, "click", "2024-01-02 09:00:00"),
    (2, "view", "2024-01-02 10:00:00"),
    (2, "click", "2024-01-02 11:00:00"),
    # u3: view only
    (3, "view", "2024-01-03 10:00:00"),
    # u4: purchase with no view: stage 1 never reached
    (4, "purchase", "2024-01-04 10:00:00"),
    # u5: same-timestamp click (ties are NOT 'later'): stalls
    (5, "view", "2024-01-05 10:00:00"),
    (5, "click", "2024-01-05 10:00:00"),
]


def _e(spark):
    return spark.createDataFrame(
        [(u, t, _ts(s)) for u, t, s in EVENTS],
        "user_id bigint, event_type string, ts timestamp")


STAGES = ["view", "click", "purchase"]


def test_funnel_conversions_strict_order(spark):
    got = {r.user: (r.t_1, r.t_2, r.t_3)
           for r in funnel_conversions(_e(spark), STAGES).collect()}
    assert got[1] == (_ts("2024-01-01 10:00:00"),
                      _ts("2024-01-01 11:00:00"),
                      _ts("2024-01-01 12:00:00"))
    # u2: the 09:00 click is before the view; the 11:00 click counts
    assert got[2] == (_ts("2024-01-02 10:00:00"),
                      _ts("2024-01-02 11:00:00"), None)
    assert got[3] == (_ts("2024-01-03 10:00:00"), None, None)
    assert got[4] == (None, None, None)
    assert got[5] == (_ts("2024-01-05 10:00:00"), None, None)


def test_funnel_counts(spark):
    got = {r.stage_name: r.users
           for r in funnel_counts(_e(spark), STAGES).collect()}
    assert got == {"view": 4, "click": 2, "purchase": 1}


def test_retention_cohorts(spark):
    rows = [
        (1, "view", "2024-01-01 10:00:00"),   # week of Jan 1 (Mon)
        (1, "view", "2024-01-09 10:00:00"),   # +1 week
        (1, "view", "2024-01-22 10:00:00"),   # +3 weeks
        (2, "view", "2024-01-02 10:00:00"),   # same cohort
        (2, "view", "2024-01-10 10:00:00"),   # +1
        (3, "view", "2024-01-09 10:00:00"),   # cohort Jan 8
    ]
    df = spark.createDataFrame(
        [(u, t, _ts(s)) for u, t, s in rows],
        "user_id bigint, event_type string, ts timestamp")
    got = {(str(r.cohort_week.date()), r.week_offset): r.users
           for r in retention_cohorts(df).collect()}
    assert got[("2024-01-01", 0)] == 2
    assert got[("2024-01-01", 1)] == 2
    assert got[("2024-01-01", 3)] == 1
    assert got[("2024-01-08", 0)] == 1
    assert ("2024-01-01", 2) not in got


def test_funnel_conversion_window(spark):
    got = {r.user: (r.t_1, r.t_2, r.t_3)
           for r in funnel_conversions(
               _e(spark), STAGES, within_seconds=1800).collect()}
    # u1's click is 60 min after view: outside a 30-min window
    assert got[1] == (_ts("2024-01-01 10:00:00"), None, None)
    # u2's valid click is 60 min after view: also out
    assert got[2] == (_ts("2024-01-02 10:00:00"), None, None)
    wide = {r.user: (r.t_1, r.t_2, r.t_3)
            for r in funnel_conversions(
                _e(spark), STAGES, within_seconds=3600).collect()}
    # 60 min exactly: inclusive upper bound
    assert wide[1] == (_ts("2024-01-01 10:00:00"),
                       _ts("2024-01-01 11:00:00"),
                       _ts("2024-01-01 12:00:00"))
