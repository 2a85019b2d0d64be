"""Sessionization + repetition-metric operators."""

from __future__ import annotations

import datetime as dt

import pytest


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), t, v)
         for u, s, t, v in rows],
        "user_id long, ts timestamp, event_type string, value double")


def test_sessionize_splits_on_gap(spark):
    from rdf_tabular_spark.ops.sessions import sessionize

    df = _ev(spark, [
        (1, 0, "a", 1.0), (1, 100, "b", 1.0), (1, 2000, "c", 1.0),
        (2, 0, "a", 1.0),
    ])
    # user 1: 0s and 100s in session 0; 2000s starts session 1 (gap > 1800)
    out = sessionize(df, gap_s=1800)
    # the _es helper column must not leak into the public output (ADVICE r2)
    assert out.columns == df.columns + ["session_id"]
    got = sorted((r["user_id"], r["ts"], r["session_id"])
                 for r in out.collect())
    assert [g[2] for g in got if g[0] == 1] == [0, 0, 1]
    assert [g[2] for g in got if g[0] == 2] == [0]


def test_sessionize_boundary_is_strict(spark):
    """Gap exactly == gap_s continues the session; gap_s+1 splits."""
    from rdf_tabular_spark.ops.sessions import sessionize

    df = _ev(spark, [(1, 0, "a", 1.0), (1, 1800, "b", 1.0),
                     (1, 3601, "c", 1.0)])
    out = sorted((r["ts"], r["session_id"])
                 for r in sessionize(df, gap_s=1800).collect())
    assert [s for _, s in out] == [0, 0, 1]


def test_session_stats_rollup(spark):
    from rdf_tabular_spark.ops.sessions import session_stats

    df = _ev(spark, [
        (1, 0, "view", 2.0), (1, 60, "click", 3.5), (1, 5000, "view", 1.0),
    ])
    rows = {r["session_id"]: r
            for r in session_stats(df, gap_s=1800).collect()}
    assert rows[0]["n_events"] == 2 and rows[0]["span_s"] == 60
    assert rows[0]["value_sum"] == 5.5 and rows[0]["n_types"] == 2
    assert rows[1]["n_events"] == 1 and rows[1]["span_s"] == 0


def test_session_stats_optional_agg_columns(spark):
    """value/event-type aggregate columns are parameterized; None omits
    the aggregate entirely (ADVICE r2 — they were hardcoded)."""
    from rdf_tabular_spark.ops.sessions import session_stats

    df = _ev(spark, [(1, 0, "view", 2.0), (1, 60, "click", 3.5)]) \
        .withColumnRenamed("value", "amount")
    out = session_stats(df, gap_s=1800, value_col="amount", type_col=None)
    assert out.columns == ["user_id", "session_id", "n_events", "span_s",
                           "value_sum"]
    r = out.collect()[0]
    assert r["value_sum"] == 5.5 and r["n_events"] == 2


def test_session_stats_partition_invariant(spark):
    from rdf_tabular_spark.ops.sessions import session_stats

    df = _ev(spark, [(u, s * 977 % 7000, "t%d" % (s % 3), float(s))
                     for u in (1, 2, 3) for s in range(40)])
    a = sorted(map(tuple, session_stats(df.repartition(2)).collect()))
    b = sorted(map(tuple, session_stats(df.repartition(13)).collect()))
    assert a == b


def test_repetition_metrics_values(spark):
    from rdf_tabular_spark.ops.text import repetition_metrics

    df = spark.createDataFrame(
        [(1, "a a a b c"), (2, "x y z w"), (3, ""), (4, "ab cd ab cd ab cd")],
        "doc_id int, text string")
    r = {x["doc_id"]: x for x in repetition_metrics(df).collect()}
    assert (r[1]["top_word_frac"], r[1]["dup_2gram_frac"]) == (0.6, 0.25)
    assert (r[2]["top_word_frac"], r[2]["dup_2gram_frac"]) == (0.25, 0.0)
    assert (r[3]["n_tokens"], r[3]["top_word_frac"]) == (0, 0.0)
    assert (r[4]["top_word_frac"], r[4]["dup_2gram_frac"]) == (0.5, 0.6)


def test_repetition_case_whitespace_normalized(spark):
    from rdf_tabular_spark.ops.text import repetition_metrics

    df = spark.createDataFrame([(1, "The  THE the")], "doc_id int, text string")
    r = repetition_metrics(df).collect()[0]
    assert r["n_tokens"] == 3 and r["top_word_frac"] == 1.0


def test_session_window_matches_islands(spark):
    """The native F.session_window formulation assigns the same sessions
    as the lag/running-sum islands formulation (boundary: an event
    exactly gap seconds after the last one MERGES; gap+1 splits)."""
    from rdf_tabular_spark.ops.sessions import (
        session_stats, session_window_stats)

    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:30:00", 2.0),   # exactly 1800s -> same session
        (1, "2024-01-01 01:00:01", 4.0),   # 1801s -> new session
        (2, "2024-01-01 00:00:00", 8.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string, value double") \
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value",
                    "'x' AS event_type")
    native = {(r.user_id, r.session_start_es, r.session_last_es,
               r.n_events, r.value_sum)
              for r in session_window_stats(ev, gap_s=1800).collect()}
    base = 1704067200  # 2024-01-01T00:00:00Z epoch
    assert native == {
        (1, base, base + 1800, 2, 3.0),
        (1, base + 3601, base + 3601, 1, 4.0),
        (2, base, base, 1, 8.0),
    }
    # cardinality parity with the islands formulation on the same input
    islands = session_stats(ev, gap_s=1800).collect()
    assert len(islands) == len(native)
