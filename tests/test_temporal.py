"""Temporal earliest-arrival reachability (ops/temporal.py)."""

from __future__ import annotations

import datetime as dt

from rdf_tabular_spark.ops.temporal import earliest_arrival


def _ts(s):
    return dt.datetime.fromisoformat(s)


EDGES = [
    ("a", "b", "2024-01-01 10:00:00"),
    ("b", "c", "2024-01-01 11:00:00"),   # respects a->b
    ("b", "d", "2024-01-01 09:00:00"),   # BEFORE arrival at b: unusable
    ("c", "d", "2024-01-01 12:00:00"),
    ("a", "d", "2024-01-02 00:00:00"),   # direct but late
]


def _e(spark, parts=3):
    return spark.createDataFrame(
        [(s, d, _ts(t)) for s, d, t in EDGES],
        "src string, dst string, ts timestamp").repartition(parts)


def _src(spark, *nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node string")


def test_time_respecting_paths_only(spark):
    got = {r.node: r.arrive for r in earliest_arrival(
        _e(spark), _src(spark, "a"), max_hops=4).collect()}
    assert got["b"] == _ts("2024-01-01 10:00:00")
    assert got["c"] == _ts("2024-01-01 11:00:00")
    # b->d at 09:00 is in the past when we arrive at 10:00; the
    # earliest VALID arrival at d is via c at 12:00, beating the
    # direct late edge
    assert got["d"] == _ts("2024-01-01 12:00:00")


def test_hop_bound_is_semantics(spark):
    got1 = {r.node for r in earliest_arrival(
        _e(spark), _src(spark, "a"), max_hops=1).collect()}
    assert got1 == {"a", "b", "d"}   # one hop: b, and d via the late edge
    got = {r.node: r.arrive for r in earliest_arrival(
        _e(spark), _src(spark, "a"), max_hops=1).collect()}
    assert got["d"] == _ts("2024-01-02 00:00:00")  # the ≤1-hop best


def test_multi_source_min(spark):
    got = {r.node: r.arrive for r in earliest_arrival(
        _e(spark), _src(spark, "a", "c"), max_hops=4).collect()}
    # c is itself a source: d reachable at 12:00 directly
    assert got["d"] == _ts("2024-01-01 12:00:00")
    assert got["c"] == _ts("1900-01-01 00:00:00")


def test_partitioning_invariant(spark):
    a = sorted(map(tuple, earliest_arrival(
        _e(spark, 1), _src(spark, "a"), max_hops=3).collect()))
    b = sorted(map(tuple, earliest_arrival(
        _e(spark, 5), _src(spark, "a"), max_hops=3).collect()))
    assert a == b


def test_early_convergence_stops(spark):
    # diameter 3 graph, max_hops 10: converges and returns
    got = earliest_arrival(_e(spark), _src(spark, "a"),
                           max_hops=10).collect()
    assert {r.node for r in got} == {"a", "b", "c", "d"}


def test_latest_departure_mirror(spark):
    from rdf_tabular_spark.ops.temporal import latest_departure

    tgt = spark.createDataFrame([("d",)], "node string")
    got = {r.node: r.depart for r in latest_departure(
        _e(spark), tgt, max_hops=4).collect()}
    # to reach d: from c take c->d at 12:00 (leave by 12:00); from b the
    # usable path is b->c (11:00) -> d, NOT the 09:00 b->d edge which is
    # still valid (09:00 <= deadline): latest departure from b is the
    # MAX over both = 11:00
    assert got["c"] == _ts("2024-01-01 12:00:00")
    assert got["b"] == _ts("2024-01-01 11:00:00")
    # from a: a->d direct at 2024-01-02, beating a->b (10:00)
    assert got["a"] == _ts("2024-01-02 00:00:00")


def test_latest_departure_respects_time(spark):
    from rdf_tabular_spark.ops.temporal import latest_departure

    # chain a -t10-> b -t5-> c: b cannot reach c after arriving at 10,
    # so a has NO path to c; b's departure toward c is 5
    e = spark.createDataFrame(
        [("a", "b", _ts("2024-01-01 10:00:00")),
         ("b", "c", _ts("2024-01-01 05:00:00"))],
        "src string, dst string, ts timestamp")
    tgt = spark.createDataFrame([("c",)], "node string")
    got = {r.node: r.depart for r in latest_departure(
        e, tgt, max_hops=4).collect()}
    assert got["b"] == _ts("2024-01-01 05:00:00")
    assert "a" not in got
