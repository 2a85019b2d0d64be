"""Deterministic splits/sampling (ops/split.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from rdf_tabular_spark.ops import split


def _bucket_py(key: str, salt: str) -> int:
    return int(hashlib.md5(f"{key}|{salt}".encode()).hexdigest()[:8], 16) % split.BUCKETS


def _docs(spark, n=400):
    return spark.createDataFrame(
        [(i, "en" if i % 3 else "fr") for i in range(n)],
        "doc_id long, lang string")


def test_hash_split_matches_python_md5(spark):
    rows = split.hash_split(_docs(spark)).collect()
    for r in rows:
        b = _bucket_py(str(r["doc_id"]), "split")
        want = "train" if b < 9000 else ("val" if b < 9500 else "test")
        assert r["split"] == want, (r, b)


def test_hash_split_partition_invariant(spark):
    d = _docs(spark)
    a = {r["doc_id"]: r["split"]
         for r in split.hash_split(d.repartition(1)).collect()}
    b = {r["doc_id"]: r["split"]
         for r in split.hash_split(d.repartition(13)).collect()}
    assert a == b


def test_hash_split_weights_normalized(spark):
    rows = split.hash_split(
        _docs(spark, 2000), weights=[("a", 1), ("b", 1)]).collect()
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    # md5 is uniform; 2000 rows at 50/50 stays well within ±10%
    assert abs(counts["a"] - counts["b"]) < 200


def test_null_keys_hash_not_default(spark):
    """NULL keys must get a real bucket (sentinel hash), not fall through
    to the last split / vanish from samples."""
    d = spark.createDataFrame([(None, "en"), (1, "en")],
                              "doc_id long, lang string")
    rows = {r["doc_id"]: r["split"] for r in split.hash_split(d).collect()}
    b = _bucket_py("__null__", "split")
    want = "train" if b < 9000 else ("val" if b < 9500 else "test")
    assert rows[None] == want
    kept = split.stratified_sample(d, {"en": 1.0}, "lang").count()
    assert kept == 2  # full fraction keeps NULL-keyed rows too


def test_stratified_sample_nested_and_exact(spark):
    d = _docs(spark, 1000)
    small = {r["doc_id"] for r in split.stratified_sample(
        d, {"en": 0.10, "fr": 0.50}, "lang").collect()}
    large = {r["doc_id"] for r in split.stratified_sample(
        d, {"en": 0.20, "fr": 0.50}, "lang").collect()}
    assert small <= large  # nested samples
    for i in small:
        b = _bucket_py(str(i), "sample")
        frac = 1000 if i % 3 else 5000
        assert b < frac
    # default_fraction=0 drops unlisted strata
    only_fr = split.stratified_sample(d, {"fr": 1.0}, "lang").collect()
    assert all(r["lang"] == "fr" for r in only_fr)
    assert len(only_fr) == sum(1 for i in range(1000) if i % 3 == 0)


def test_leakage_safe_split_keeps_clusters_together(spark):
    from rdf_tabular_spark.ops.dedup import dedup_clusters
    from rdf_tabular_spark.ops.split import leakage_safe_split

    docs = spark.createDataFrame(
        [(f"d{i}",) for i in range(40)], "doc_id string")
    # chain pairs: clusters {d0..d3}, {d10,d11}, rest singletons
    pairs = spark.createDataFrame(
        [("d0", "d1"), ("d1", "d2"), ("d2", "d3"), ("d10", "d11")],
        "a string, b string")
    out = leakage_safe_split(dedup_clusters(docs, pairs)).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    # every cluster maps to exactly one split — no near-dup leakage
    assert all(len(s) == 1 for s in by_cluster.values())
    big = {r.split for r in out if r.cluster_id == "d0"}
    assert len(big) == 1 and len([r for r in out if r.cluster_id == "d0"]) == 4


def test_weighted_sample_monotone_and_deterministic(spark):
    from rdf_tabular_spark.ops.split import weighted_sample

    df = spark.createDataFrame(
        [(i, 0.1 + 0.8 * (i % 10) / 10) for i in range(200)],
        "doc_id long, w double")
    lo = {r.doc_id for r in weighted_sample(df, "w", scale=0.5).collect()}
    hi = {r.doc_id for r in weighted_sample(df, "w", scale=1.0).collect()}
    assert lo <= hi and len(lo) < len(hi)  # monotone: scale only adds rows
    again = {r.doc_id for r in weighted_sample(
        df.repartition(7), "w", scale=0.5).collect()}
    assert again == lo  # layout-invariant
    # weight >= 1 keeps everything
    allkept = weighted_sample(
        df.withColumn("w", F.lit(1.5)), "w").count()
    assert allkept == 200


def test_weighted_sample_null_weight_dropped(spark):
    from rdf_tabular_spark.ops.split import weighted_sample

    df = spark.createDataFrame(
        [(1, None), (2, 1.0)], "doc_id long, w double")
    kept = {r.doc_id for r in weighted_sample(df, "w").collect()}
    assert kept == {2}  # NULL weight = conservative drop, never 100% keep


def test_source_quota_sample(spark):
    """Quota cap: at most N per source, deterministic across partition
    layouts, monotone in quota (raising it only adds rows)."""
    from rdf_tabular_spark.ops.split import source_quota_sample

    rows = [(i, f"s{i % 3}") for i in range(60)] + [(100 + i, "hot")
                                                    for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    kept = source_quota_sample(df, 5)
    per = {r["source"]: r["count"]
           for r in kept.groupBy("source").count().collect()}
    assert all(v == 5 for v in per.values()) and len(per) == 4

    a = sorted(r["doc_id"] for r in source_quota_sample(
        df.repartition(2), 5).collect())
    b = sorted(r["doc_id"] for r in source_quota_sample(
        df.repartition(13), 5).collect())
    assert a == b

    small = {r["doc_id"] for r in source_quota_sample(df, 5).collect()}
    big = {r["doc_id"] for r in source_quota_sample(df, 9).collect()}
    assert small <= big


def test_rebalance_mix(spark):
    """Mix rebalance: the scarcest source (relative to its target) keeps
    everything, proportions approach the target, absent sources drop,
    and keeps are layout-invariant."""
    from rdf_tabular_spark.ops.split import rebalance_mix

    rows = ([(i, "web") for i in range(400)]
            + [(1000 + i, "code") for i in range(100)]
            + [(2000 + i, "junk") for i in range(50)])
    df = spark.createDataFrame(rows, "doc_id long, source string")

    out = rebalance_mix(df, {"web": 0.5, "code": 0.5})
    per = {r["source"]: r["count"]
           for r in out.groupBy("source").count().collect()}
    # T = min(400/0.5, 100/0.5) = 200 -> code keeps all 100,
    # web keeps ~100 of 400 (md5 Bernoulli at p=0.25)
    assert per["code"] == 100
    assert 70 <= per["web"] <= 130
    assert "junk" not in per

    a = sorted(r["doc_id"] for r in rebalance_mix(
        df.repartition(3), {"web": 0.5, "code": 0.5}).collect())
    b = sorted(r["doc_id"] for r in rebalance_mix(
        df.repartition(11), {"web": 0.5, "code": 0.5}).collect())
    assert a == b


def test_temperature_mix_flattens_head(spark):
    from rdf_tabular_spark.ops.split import temperature_mix

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    natural = {r.lang: r["count"] for r in
               docs.groupBy("lang").count().collect() if r.lang}
    kept = temperature_mix(docs, alpha=0.3)
    mixed = {r.lang: r["count"] for r in
             kept.groupBy("lang").count().collect()}
    # scarcest language keeps everything (T chosen so it is reachable)
    scarcest = min(natural, key=lambda g: natural[g])
    assert mixed[scarcest] >= natural[scarcest] * 0.98
    # head-to-tail ratio strictly flattens vs natural proportions
    head = max(natural, key=lambda g: natural[g])
    assert (mixed[head] / mixed[scarcest]
            < natural[head] / natural[scarcest])
    # alpha=1 keeps natural proportions (cut = 100% everywhere)
    assert temperature_mix(docs, alpha=1.0).count() == docs.count()


def test_temperature_mix_deterministic_and_validated(spark):
    import pytest as _pytest
    from rdf_tabular_spark.ops.split import temperature_mix

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(r.doc_id for r in temperature_mix(
        docs.repartition(3), 0.5).select("doc_id").collect())
    b = sorted(r.doc_id for r in temperature_mix(
        docs.repartition(11), 0.5).select("doc_id").collect())
    assert a == b
    with _pytest.raises(ValueError):
        temperature_mix(docs, alpha=-0.1)
