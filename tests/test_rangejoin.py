"""Bucket-banded range joins (ops/rangejoin.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_tabular_spark.ops import rangejoin

SF_DIR = "/root/testdata/sf0.001"


def _pts(spark):
    return spark.createDataFrame(
        [(1, "2024-01-01 00:30:00"), (2, "2024-01-01 05:00:00"),
         (3, "2024-01-02 00:00:00")],
        "pid long, t string").select("pid", F.col("t").cast("timestamp").alias("t"))


def _ivs(spark):
    return spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),   # spans 2 buckets
         (11, "2024-01-01 04:30:00", "2024-01-01 06:30:00"),
         (12, "2024-01-03 00:00:00", "2024-01-03 01:00:00")],
        "iid long, lo string, hi string").select(
        "iid", F.col("lo").cast("timestamp").alias("lo"),
        F.col("hi").cast("timestamp").alias("hi"))


def test_point_in_interval_exact_and_no_dups(spark):
    got = sorted((r.pid, r.iid) for r in rangejoin.point_in_interval_join(
        _pts(spark), _ivs(spark), "t", "lo", "hi").collect())
    assert got == [(1, 10), (2, 11)]


def test_point_boundaries_inclusive(spark):
    pts = spark.createDataFrame([(1, "2024-01-01 00:00:00"),
                                 (2, "2024-01-01 01:00:00")],
                                "pid long, t string").select(
        "pid", F.col("t").cast("timestamp").alias("t"))
    got = sorted((r.pid, r.iid) for r in rangejoin.point_in_interval_join(
        pts, _ivs(spark), "t", "lo", "hi").collect())
    assert got == [(1, 10), (2, 10)]


def test_overlap_join_each_pair_once(spark):
    left = _ivs(spark).select(F.col("iid").alias("aid"),
                              F.col("lo").alias("alo"), F.col("hi").alias("ahi"))
    right = spark.createDataFrame(
        [(20, "2024-01-01 00:45:00", "2024-01-01 05:15:00"),  # overlaps 10 & 11
         (21, "2024-01-02 23:00:00", "2024-01-03 23:00:00")],  # overlaps 12
        "bid long, lo string, hi string").select(
        "bid", F.col("lo").cast("timestamp").alias("blo"),
        F.col("hi").cast("timestamp").alias("bhi"))
    out = rangejoin.interval_overlap_join(
        left, right, "alo", "ahi", "blo", "bhi").collect()
    pairs = sorted((r.aid, r.bid) for r in out)
    assert pairs == [(10, 20), (11, 20), (12, 21)]
    assert len(out) == len(set(pairs))  # ownership rule: no duplicates


def test_overlap_matches_naive_on_sf(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(200)
    a = orders.select(F.col("o_orderkey").alias("aid"),
                      F.col("o_orderdate").alias("alo"),
                      (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("ahi"))
    b = orders.select(F.col("o_orderkey").alias("bid"),
                      F.col("o_orderdate").alias("blo"),
                      (F.col("o_orderdate") + F.expr("INTERVAL 2 DAYS")).alias("bhi"))
    fast = {(r.aid, r.bid) for r in rangejoin.interval_overlap_join(
        a, b, "alo", "ahi", "blo", "bhi", bucket_width=86400).collect()}
    naive = {(r.aid, r.bid) for r in a.crossJoin(b).filter(
        (F.col("alo") <= F.col("bhi")) & (F.col("blo") <= F.col("ahi"))).collect()}
    assert fast == naive


def test_equi_join_plan_no_nested_loop(spark):
    plan = rangejoin.point_in_interval_join(
        _pts(spark), _ivs(spark), "t", "lo", "hi")._jdf \
        .queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
