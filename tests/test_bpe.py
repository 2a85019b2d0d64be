"""BPE trainer/encoder vs a pure-Python reference implementation.

The trainer has no SQL twin (iterative re-segmentation); parity with an
independent in-memory implementation of the public algorithm is the
correctness pin, same evidence class as the golden fixtures.
"""
from __future__ import annotations

import re
from collections import Counter

EOW = "</w>"


def _ref_vocab(texts):
    words = Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.lower().strip()).split(" "):
            if w:
                words[w] += 1
    return {tuple(list(w) + [EOW]): c for w, c in words.items()}


def _ref_merge(syms, left, right):
    out = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return tuple(out)


def _ref_train(texts, n_merges, min_pair_count=2):
    vocab = _ref_vocab(texts)
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # same tie-break as the Spark trainer: count desc, then (l, r) asc
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_pair_count:
            break
        merges.append((left, right, cnt))
        vocab = {_ref_merge(s, left, right): c for s, c in vocab.items()}
    return merges


CORPUS = [
    "low lower lowest",
    "new newer newest newest",
    "wider wide widest",
    "low low new new",
]


def test_bpe_train_matches_reference(spark):
    from rdf_tabular_spark.ops.bpe import bpe_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    got = bpe_train(docs, n_merges=8)
    want = _ref_train(CORPUS, 8)
    assert got == want
    assert len(got) == 8  # corpus is rich enough for all 8 merges


def test_bpe_encode_matches_reference_segmentation(spark):
    from rdf_tabular_spark.ops.bpe import bpe_encode, bpe_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    merges = bpe_train(docs, n_merges=6)

    out = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    for i, text in enumerate(CORPUS):
        want = []
        for w in text.split(" "):
            syms = tuple(list(w) + [EOW])
            for left, right, _ in merges:
                syms = _ref_merge(syms, left, right)
            want.extend(syms)
        assert out[i].bpe_tokens == want
        assert out[i].n_bpe_tokens == len(want)


def test_bpe_encode_null_and_empty(spark):
    from rdf_tabular_spark.ops.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string")
    out = {r.doc_id: r.n_bpe_tokens
           for r in bpe_encode(docs, [("l", "o", 2)]).collect()}
    assert out == {1: 0, 2: 0}


def test_bpe_train_min_pair_count_stops(spark):
    from rdf_tabular_spark.ops.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "ab cd ef")], "doc_id long, text string")  # every pair count 1
    assert bpe_train(docs, n_merges=5, min_pair_count=2) == []


def test_bpe_encode_udf_engine_matches_native(spark):
    """The Arrow-batched rank-map engine must produce byte-identical
    output to the chained-native-fold engine (ops/bpe.py bpe_encode)."""
    from rdf_tabular_spark.ops.bpe import bpe_encode, bpe_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS + [None, "", "  low\t new "])],
        "doc_id long, text string")
    merges = bpe_train(docs, n_merges=6)
    native = {r.doc_id: (r.n_bpe_tokens, r.bpe_tokens)
              for r in bpe_encode(docs, merges, engine="native").collect()}
    udf = {r.doc_id: (r.n_bpe_tokens, r.bpe_tokens)
           for r in bpe_encode(docs, merges, engine="udf").collect()}
    assert native == udf


def _syllable_corpus():
    """Deterministic corpus rich enough to learn 1000+ merges: 3-syllable
    words over a 9-syllable alphabet, each word twice (so every pair
    clears min_pair_count=2)."""
    syl = ["ba", "ce", "di", "fo", "gu", "hy", "ka", "lo", "mu"]
    words = [a + b + c + d
             for a in syl for b in syl for c in syl for d in syl[:2]][:1400]
    texts = []
    for i in range(0, len(words), 30):
        chunk = " ".join(words[i:i + 30])
        texts.append(chunk)
        texts.append(chunk)  # second occurrence => pair counts >= 2
    return texts


def test_bpe_encode_udf_1k_merges_matches_reference(spark):
    """The scale engine at a real merge-list size the native path cannot
    reach: 1000 merges trained by the pure-Python reference, applied by
    the UDF engine, compared word-for-word against sequential reference
    application (VERDICT r2 item 3)."""
    from rdf_tabular_spark.ops.bpe import bpe_encode

    texts = _syllable_corpus()
    merges = _ref_train(texts, 1000)
    assert len(merges) == 1000

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r.doc_id: list(r.bpe_tokens)
           for r in bpe_encode(docs, merges).collect()}  # auto -> udf

    seg_cache: dict[str, tuple] = {}

    def ref_segment(w):
        if w not in seg_cache:
            syms = tuple(list(w) + [EOW])
            for left, right, _ in merges:
                syms = _ref_merge(syms, left, right)
            seg_cache[w] = syms
        return seg_cache[w]

    for i, text in enumerate(texts):
        want = []
        for w in text.split(" "):
            want.extend(ref_segment(w))
        assert got[i] == want, f"doc {i} diverged"
