"""As-of join: hand-built timelines with ties, misses and tolerance."""
from __future__ import annotations

from pyspark.sql import functions as F


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10.0, "e1"), (1, 20.0, "e2"), (1, 5.0, "e0"),
         (2, 50.0, "e3"), (3, 7.0, "e4")],
        "k long, t double, ev string")
    right = spark.createDataFrame(
        [(1, 10.0, "r10"), (1, 15.0, "r15"), (2, 60.0, "r60")],
        "k long, t double, v string")
    return left, right


def test_asof_backward_semantics(spark):
    from rdf_tabular_spark.ops.asof import asof_join_backward

    left, right = _frames(spark)
    out = {r.ev: (r.v, r.asof_time) for r in asof_join_backward(
        left, right.withColumnRenamed("t", "rt"),
        on="k", left_time="t", right_time="rt",
        right_values=["v"]).collect()}
    assert out["e1"] == ("r10", 10.0)   # tie: at-or-before includes equal
    assert out["e2"] == ("r15", 15.0)   # latest prior, not first
    assert out["e0"] == (None, None)    # nothing at or before
    assert out["e3"] == (None, None)    # right exists but only later
    assert out["e4"] == (None, None)    # key with no right rows at all


def test_asof_tolerance_and_null_payload(spark):
    from rdf_tabular_spark.ops.asof import asof_join_backward

    left = spark.createDataFrame([(1, 100.0, "e")], "k long, t double, ev string")
    right = spark.createDataFrame(
        [(1, 10.0, "old"), (1, 95.0, None)], "k long, rt double, v string")
    out = asof_join_backward(
        left, right, on="k", left_time="t", right_time="rt",
        right_values=["v"]).collect()[0]
    # the struct carry keeps the NULL-valued newest row (a bare
    # last(v, ignorenulls) would skip back to 'old' — wrong)
    assert out.v is None and out.asof_time == 95.0

    out2 = asof_join_backward(
        left, right, on="k", left_time="t", right_time="rt",
        right_values=["v"], tolerance_seconds=3).collect()[0]
    assert out2.asof_time is None  # 95 is 5s old, beyond the tolerance


def test_asof_left_columns_preserved(spark):
    from rdf_tabular_spark.ops.asof import asof_join_backward

    left, right = _frames(spark)
    out = asof_join_backward(
        left, right.withColumnRenamed("t", "rt"),
        on="k", left_time="t", right_time="rt", right_values=["v"])
    assert out.columns == ["k", "t", "ev", "v", "asof_time"]
    assert out.count() == left.count()


def test_asof_null_right_time_never_matches(spark):
    """A NULL right timestamp must not become a phantom 'prior' match
    (DuckDB's native ASOF matches nothing for NULL times)."""
    from rdf_tabular_spark.ops.asof import asof_join_backward

    left = spark.createDataFrame([(1, 5.0, "e")], "k long, t double, ev string")
    right = spark.createDataFrame(
        [(1, None, "phantom")], "k long, rt double, v string")
    out = asof_join_backward(
        left, right, on="k", left_time="t", right_time="rt",
        right_values=["v"]).collect()[0]
    assert out.v is None and out.asof_time is None
