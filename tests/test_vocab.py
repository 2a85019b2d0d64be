"""Vocabulary stats + TF-IDF (ops/vocab.py), pinned by hand computation."""

from __future__ import annotations

import math

from rdf_tabular_spark.ops import vocab

DOCS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "The   cat  ate"),
    ("d3", "dogs bark"),
    ("d4", ""),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_vocab_counts(spark):
    got = {r["token"]: (r["term_freq"], r["doc_freq"])
           for r in vocab.vocab_counts(_docs(spark)).collect()}
    # normalization lowercases + collapses runs; the empty doc vanishes
    assert got == {
        "the": (3, 2), "cat": (2, 2), "sat": (1, 1), "on": (1, 1),
        "mat": (1, 1), "ate": (1, 1), "dogs": (1, 1), "bark": (1, 1),
    }
    filtered = {r["token"] for r in
                vocab.vocab_counts(_docs(spark), min_count=2).collect()}
    assert filtered == {"the", "cat"}


def test_tfidf_topk(spark):
    rows = vocab.tfidf_topk(_docs(spark), k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for v in by_doc.values():
        v.sort(key=lambda r: r["rank"])
    # d1: "the" tf=2 ranks first; cat/mat/on/sat tie at tf=1 -> df ASC
    # puts the doc-unique ones ahead of "cat" (df=2), token ASC -> "mat"
    assert [r["token"] for r in by_doc["d1"]] == ["the", "mat"]
    # d2: all tf=1 -> df ASC puts "ate" (df=1) first, then cat (df=2)
    assert [r["token"] for r in by_doc["d2"]] == ["ate", "cat"]
    assert [r["token"] for r in by_doc["d3"]] == ["bark", "dogs"]
    assert "d4" not in by_doc
    # score spot-check: N=4 distinct docs; d1 "the": tf=2, df=2
    want = round(2 * (math.log(5 / 3) + 1), 6)
    the_row = by_doc["d1"][0]
    assert the_row["tf"] == 2 and the_row["df"] == 2
    assert the_row["tfidf"] == want


def test_oov_rate(spark):
    from rdf_tabular_spark.ops.vocab import oov_rate

    docs = spark.createDataFrame(
        [(1, "a a a b rare1"), (2, "b b a"), (3, "rare2 rare3")],
        "doc_id long, text string")
    # top-2 vocab by freq then token: a(5), b(4) -> {a, b}
    got = {r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate)
           for r in oov_rate(docs, vocab_k=2).collect()}
    assert got[1] == (5, 1, 0.2)
    assert got[2] == (3, 0, 0.0)
    assert got[3] == (2, 2, 1.0)


def test_oov_rate_keeps_empty_documents(spark):
    from rdf_tabular_spark.ops.vocab import oov_rate

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, ""), (3, None)], "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate)
           for r in oov_rate(docs, vocab_k=1).collect()}
    assert set(got) == {1, 2, 3}  # per-document means EVERY document
    assert got[2] == (0, 0, None) and got[3] == (0, 0, None)
    assert got[1] == (3, 1, round(1 / 3, 6))
