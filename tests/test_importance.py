"""DSIR-style hashed-unigram importance weighting (ops/importance.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rdf_tabular_spark.ops import importance

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _mini(spark):
    rows = [
        (1, "alpha beta alpha", "en"),
        (2, "alpha beta", "en"),
        (3, "gamma delta gamma delta", "fr"),
        (4, "gamma gamma", "fr"),
        (5, "alpha gamma", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_bucket_table_counts_and_ratio(spark):
    df = _mini(spark)
    tab = importance.hashed_bucket_logratios(df, "lang = 'en'", buckets=64)
    rows = {r.bucket: r for r in tab.collect()}
    # raw totals across buckets == total token occurrences
    assert sum(r.n_raw for r in rows.values()) == 13
    assert sum(r.n_target for r in rows.values()) == 5
    # verify one bucket's quantized ratio in closed form
    any_b, r = next(iter(rows.items()))
    expect = round((math.log((r.n_target + 1) / (5 + 64.0))
                    - math.log((r.n_raw + 1) / (13 + 64.0))) * 1e6)
    assert r.logratio_micronats == expect


def test_target_tokens_score_higher(spark):
    df = _mini(spark)
    w = {r.doc_id: r.per_token_logratio
         for r in importance.importance_weights(
             df, "lang = 'en'", buckets=64).collect()}
    # pure-target-vocabulary docs outrank pure-non-target ones
    assert w[1] > w[3] and w[2] > w[4]
    # the mixed doc sits between
    assert w[3] < w[5] < w[1]


def test_weights_layout_invariant(docs):
    a = sorted(map(tuple, importance.importance_weights(
        docs.repartition(3), "lang = 'en'", buckets=512).collect()))
    b = sorted(map(tuple, importance.importance_weights(
        docs.repartition(11), "lang = 'en'", buckets=512).collect()))
    assert a == b


def test_resample_top_fraction(spark):
    df = _mini(spark)
    w = importance.importance_weights(df, "lang = 'en'", buckets=64)
    kept = importance.resample_by_importance(w, 0.4)
    ids = sorted(r.doc_id for r in kept.collect())
    assert len(ids) == 2
    # the two all-target-vocab docs win
    assert ids == [1, 2]


def test_resample_fraction_validated(spark):
    w = importance.importance_weights(_mini(spark), "lang = 'en'", buckets=64)
    with pytest.raises(ValueError):
        importance.resample_by_importance(w, 0.0)
