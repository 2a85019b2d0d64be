"""select_token_budget: the two-histogram + bounded-window selection
must equal the naive global-prefix rule exactly (ops/split.py r4 tail 4)."""

from __future__ import annotations

import hashlib

import pytest

from rdf_tabular_spark.ops.split import select_token_budget


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, quality_micro long, n_tokens long")


def ref_select(rows, budget):
    """Naive replay of the declared rule: global order (quality DESC,
    md5(id), id), maximal prefix with cumulative tokens <= budget."""
    order = sorted(rows, key=lambda r: (
        -r[1], hashlib.md5(r[0].encode()).hexdigest(), r[0]))
    out, cum = [], 0
    for r in order:
        if cum + r[2] > budget:
            break
        cum += r[2]
        out.append(r)
    return sorted(out)


ROWS = [(f"d{i:03d}", (i % 4) * 250_000, 10 + (i * 7) % 90)
        for i in range(200)]


@pytest.mark.parametrize("budget", [0, 1, 500, 2_000, 4_321, 10**9])
def test_matches_naive_prefix(spark, budget):
    got = sorted(tuple(r) for r in
                 select_token_budget(_docs(spark, ROWS), budget).collect())
    assert got == ref_select(ROWS, budget)


def test_exact_bucket_boundary(spark):
    # budget exactly exhausts the top-quality bucket: no boundary window
    rows = [("a", 2, 50), ("b", 2, 50), ("c", 1, 10)]
    budget = 100
    got = sorted(r["doc_id"] for r in
                 select_token_budget(_docs(spark, rows), budget).collect())
    assert got == ["a", "b"]


def test_zero_token_docs_at_cut(spark):
    # zero-token docs keep riding the prefix while cum == budget
    rows = [("a", 1, 100), ("b", 1, 0), ("c", 1, 0), ("z", 0, 5)]
    got = sorted(tuple(r) for r in
                 select_token_budget(_docs(spark, rows), 100).collect())
    assert got == ref_select(rows, 100)


def test_partition_invariant(spark):
    df = _docs(spark, ROWS).repartition(13)
    got = sorted(tuple(r) for r in
                 select_token_budget(df, 3_333).collect())
    assert got == ref_select(ROWS, 3_333)


from hypothesis import given, settings, strategies as st

_doc_st = st.lists(
    st.tuples(st.integers(0, 60), st.integers(0, 3), st.integers(0, 40)),
    min_size=1, max_size=40, unique_by=lambda t: t[0],
).map(lambda rows: [(f"d{i}", q * 125_000, t) for i, q, t in rows])


@settings(max_examples=15, deadline=None)
@given(rows=_doc_st, budget=st.integers(0, 600))
def test_fuzz_matches_naive_prefix(spark, rows, budget):
    got = sorted(tuple(r) for r in
                 select_token_budget(_docs(spark, rows), budget).collect())
    assert got == ref_select(rows, budget)
