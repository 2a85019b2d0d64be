"""Per-source boilerplate removal (ops/boilerplate.py)."""

from __future__ import annotations

from rdf_tabular_spark.ops.boilerplate import (
    boilerplate_lines, remove_boilerplate)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, site string, text string")


def _base(spark):
    # site a: footer in 3/4 docs (> 0.5, >= 3) -> boilerplate; "promo"
    # in 2/4 (not > 0.5) -> kept. site b: 2 docs sharing a line — below
    # min_docs, never boilerplate. d4 is pure chrome.
    return _docs(spark, [
        ("d1", "a", "unique one\nthe footer"),
        ("d2", "a", "promo\nunique two\nthe footer"),
        ("d3", "a", "promo\nunique three"),
        ("d4", "a", "the footer"),
        ("d5", "b", "shared b line\nunique four"),
        ("d6", "b", "shared b line"),
    ])


def test_detection_threshold_and_min_docs(spark):
    got = {(r["site"], r["n_docs"], r["site_docs"])
           for r in boilerplate_lines(_base(spark)).collect()}
    assert got == {("a", 3, 4)}  # only the footer; nothing from site b


def test_removal_keeps_rows_and_counts(spark):
    out = {r["doc_id"]: r for r in remove_boilerplate(_base(spark)).collect()}
    assert out["d1"]["text"] == "unique one" and out["d1"]["n_removed"] == 1
    assert out["d2"]["text"] == "promo\nunique two"
    assert out["d3"]["text"] == "promo\nunique three"
    assert out["d3"]["n_removed"] == 0
    # pure-chrome doc comes back EMPTY, not dropped
    assert out["d4"]["text"] == "" and out["d4"]["n_removed"] == 1
    # untouched site keeps its text verbatim
    assert out["d5"]["text"] == "shared b line\nunique four"
    assert len(out) == 6


def test_exact_threshold_is_not_boilerplate(spark):
    docs = _docs(spark, [
        (f"d{i}", "a", ("half line\n" if i < 3 else "") + f"u{i}")
        for i in range(6)])  # 3/6 == 0.5, strict > excludes it
    assert boilerplate_lines(docs).count() == 0


def test_empty_lines_never_counted_but_preserved(spark):
    docs = _docs(spark, [
        ("d1", "a", "x\n\nfoot"), ("d2", "a", "y\n\nfoot"),
        ("d3", "a", "z\n\nfoot"), ("d4", "a", "w\n\nfoot"),
    ])
    got = remove_boilerplate(docs).collect()
    assert {r["text"] for r in got} == {"x\n", "y\n", "z\n", "w\n"}
    assert all(r["n_removed"] == 1 for r in got)
