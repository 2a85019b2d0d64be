"""Curation-pass operators: PII scrub, train/test decontamination,
sequence packing.  These model the standard pre-training hygiene passes
(none exist in the reference — they're the LLM-pipeline extension
surface; see SURVEY.md §2.9)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


# ---------------------------------------------------------------- PII


def test_pii_scrub_counts_and_redacts(spark):
    from rdf_tabular_spark.ops.pii import pii_scrub

    df = spark.createDataFrame(
        [(1, "mail a@b.com and c.d@e.org, ip 10.0.0.1, tel +1-555-0100"),
         (2, "clean text with no personal data at all"),
         (3, "+44-1234-5678-999 twice +1-555-0147")],
        "doc_id int, text string")
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (rows[1]["n_emails"], rows[1]["n_ipv4"], rows[1]["n_phones"]) \
        == (2, 1, 1)
    assert "<EMAIL>" in rows[1]["redacted"]
    assert "<IP>" in rows[1]["redacted"]
    assert "<PHONE>" in rows[1]["redacted"]
    assert "a@b.com" not in rows[1]["redacted"]
    assert rows[2]["redacted"] == rows[2]["text"]
    assert rows[2]["n_emails"] == rows[2]["n_ipv4"] == rows[2]["n_phones"] == 0
    assert rows[3]["n_phones"] == 2


def test_pii_staging_no_double_count(spark):
    """An IP-shaped digit run inside an email's domain must not count as an
    IP once the email is masked."""
    from rdf_tabular_spark.ops.pii import pii_scrub

    df = spark.createDataFrame([(1, "u@10.0.0.1.example.com only")],
                               "doc_id int, text string")
    r = pii_scrub(df).collect()[0]
    assert r["n_emails"] == 1
    assert r["n_ipv4"] == 0


def test_pii_flag_matches_scrub(docs):
    from rdf_tabular_spark.ops.pii import pii_flag, pii_scrub

    enriched = docs.limit(200).select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat("text", F.lit(" x@y.io"))).otherwise(F.col("text"))
        .alias("text"))
    flagged = {r["doc_id"] for r in pii_flag(enriched)
               .filter("has_pii").collect()}
    scrubbed = {r["doc_id"] for r in pii_scrub(enriched)
                .filter("n_emails + n_ipv4 + n_phones > 0").collect()}
    assert flagged == scrubbed
    assert flagged  # non-vacuous


# ------------------------------------------------------- decontamination


def test_decon_flags_eval_docs_and_copies(spark):
    from rdf_tabular_spark.ops.decon import contaminated_docs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train = spark.createDataFrame(
        [(1, base + " extra tail words here"),   # contains eval 8-grams
         (2, "totally different content with nothing shared at all ok"),
         (10, base)],                            # the eval doc itself
        "doc_id int, text string")
    test = train.filter("doc_id = 10")
    out = {r["doc_id"]: r["n_test_ngrams"]
           for r in contaminated_docs(train, test, n=8).collect()}
    assert 10 in out and 1 in out and 2 not in out
    # base has 10 tokens -> 3 distinct 8-grams, all present in doc 1
    assert out[10] == 3 and out[1] == 3


def test_decon_short_docs_yield_no_grams(spark):
    from rdf_tabular_spark.ops.decon import ngram_hash_set

    df = spark.createDataFrame([(1, "one two three")], "doc_id int, text string")
    assert ngram_hash_set(df, 8).count() == 0


def test_decon_normalization_insensitive(spark):
    """Case/whitespace differences must not defeat the overlap check."""
    from rdf_tabular_spark.ops.decon import contaminated_docs

    test = spark.createDataFrame(
        [(10, "The Quick Brown Fox Jumps Over The Lazy Dog")],
        "doc_id int, text string")
    train = spark.createDataFrame(
        [(1, "the  quick   brown fox jumps over the lazy dog indeed")],
        "doc_id int, text string")
    assert contaminated_docs(train, test, n=8).count() == 1


# ----------------------------------------------------------- packing


def test_pack_offsets_contiguous_within_shard(docs):
    from rdf_tabular_spark.ops.pack import pack_offsets

    out = pack_offsets(docs, max_tokens=256, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(4)) and len(by_shard) > 1
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rows:
            assert r["bin_id"] == off // 256
            assert r["bin_offset"] == off % 256
            off += r["n_tokens"]


def test_pack_deterministic_across_partitioning(docs):
    from rdf_tabular_spark.ops.pack import pack_offsets

    a = sorted(map(tuple, pack_offsets(docs.repartition(3),
                                       max_tokens=128).collect()))
    b = sorted(map(tuple, pack_offsets(docs.repartition(11),
                                       max_tokens=128).collect()))
    assert a == b


def test_quality_filter_reasons(spark):
    from rdf_tabular_spark.ops.text import quality_filter

    good = ("the quick brown fox jumps over the lazy dog and then "
            "walks back home to rest for a while with friends")
    short = "too short"
    spam = " ".join(["buy"] * 50)
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, spam)], "doc_id long, text string")
    rows = {r.doc_id: r for r in quality_filter(
        docs, min_stopword_ratio=0.05).collect()}
    assert rows[1].keep and rows[1].drop_reasons == []
    assert not rows[2].keep and "length" in rows[2].drop_reasons
    assert not rows[3].keep and "top_word" in rows[3].drop_reasons
    # repeated single word also trips the dup-2gram cap
    assert "dup_2gram" in rows[3].drop_reasons


def test_ngram_lm_score_stupid_backoff(spark):
    import math

    from rdf_tabular_spark.ops.text import ngram_lm_score

    docs = spark.createDataFrame([
        (1, "the cat sat on the mat"),
        (2, "the cat sat"),
        (3, "zzz qqq"),       # zzz unseen by the LM -> unseen-word floor
        (4, "single"),        # no bigrams -> NULL score
    ], "doc_id long, text string")
    lm = docs.filter("doc_id <= 2")
    rows = {r.doc_id: r for r in ngram_lm_score(docs, lm_docs=lm).collect()}

    # LM corpus: 9 tokens. doc 2 bigrams: (the,cat) p=2/3, (cat,sat) p=1
    def qln(p):
        return round(math.log(p) * 1e6)

    expect2 = round((qln(2 / 3) + qln(1.0)) / 2 / 1e6, 6)
    assert rows[2].n_bigrams == 2 and abs(rows[2].lm_score - expect2) < 1e-9
    # doc 3: (zzz,qqq) -> alpha^2 / N = 0.4*0.4/9
    expect3 = round(qln(0.4 * 0.4 / 9) / 1 / 1e6, 6)
    assert rows[3].n_bigrams == 1 and abs(rows[3].lm_score - expect3) < 1e-9
    assert rows[4].n_bigrams == 0 and rows[4].lm_score is None


def test_null_text_is_empty_document(spark):
    from rdf_tabular_spark.ops.text import (
        bpe_ish_token_count, quality_filter, token_count)

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "hello world")], "doc_id long, text string")
    counted = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n"),
        bpe_ish_token_count(F.col("text")).alias("nb")).collect()
    got = {r.doc_id: (r.n, r.nb) for r in counted}
    # NULL text == empty document, never -1 (legacy size(NULL)) or NULL
    assert got[1] == (0, 0) and got[2] == (0, 0) and got[3][0] == 2

    qf = {r.doc_id: r for r in quality_filter(docs).collect()}
    assert qf[1].keep == qf[2].keep  # NULL and '' get identical decisions
    assert "length" in qf[1].drop_reasons


def test_corpus_stats_rollup(spark):
    from rdf_tabular_spark.ops.text import corpus_stats

    good = ("the quick brown fox jumps over the lazy dog and then "
            "walks back home to rest for a while with friends")
    docs = spark.createDataFrame(
        [(1, good, "en"), (2, "too short", "en"), (3, good, "fr")],
        "doc_id long, text string, lang string")
    got = {r.lang: r for r in corpus_stats(
        docs, min_stopword_ratio=0.05).collect()}
    assert got["en"].n_docs == 2 and got["en"].n_kept == 1
    assert got["en"].keep_rate == 0.5
    assert got["fr"].n_docs == 1 and got["fr"].keep_rate == 1.0
    assert got["en"].total_tokens == 21 + 2


def test_chunk_documents_windows(spark):
    from rdf_tabular_spark.ops.pack import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    docs = spark.createDataFrame(
        [(1, text), (2, "a b"), (3, None), (4, "")],
        "doc_id long, text string")
    rows = chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    got = {(r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_text) for r in rows}
    # stride 3: chunks at 0,3,6 cover [0,4),[3,7),[6,10) -> ceil(9/3)=3
    assert got[(1, 0)] == (4, "w0 w1 w2 w3")
    assert got[(1, 1)] == (4, "w3 w4 w5 w6")
    assert got[(1, 2)] == (4, "w6 w7 w8 w9")
    assert (1, 3) not in got
    # short doc: single remainder chunk
    assert got[(2, 0)] == (2, "a b")
    # NULL / empty docs emit nothing
    assert all(d not in (3, 4) for d, _ in got)
    # consecutive chunks overlap by exactly `overlap` tokens
    assert got[(1, 0)][1].split()[-1:] == got[(1, 1)][1].split()[:1]

    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_edge_whitespace_documents(spark):
    """Leading/trailing non-space whitespace must not create phantom
    tokens: trim() strips only 0x20, so normalize must collapse BEFORE
    trimming (review r2 — chunker dropped '\\n'-prefixed docs entirely)."""
    from rdf_tabular_spark.ops.bpe import bpe_encode
    from rdf_tabular_spark.ops.pack import chunk_documents
    from rdf_tabular_spark.ops.text import nonempty_tokens, token_count

    docs = spark.createDataFrame(
        [(1, "\nhello world"), (2, "hello world\n"), (3, "\t hi \t")],
        "doc_id long, text string")
    toks = {r.doc_id: r.t for r in docs.select(
        "doc_id", nonempty_tokens(F.col("text")).alias("t")).collect()}
    assert toks[1] == ["hello", "world"]
    assert toks[2] == ["hello", "world"]
    assert toks[3] == ["hi"]

    chunks = chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    # every doc chunks; no phantom token inflates n_tokens
    assert {d for d in by_doc} == {1, 2, 3}
    assert by_doc[1][0].n_tokens == 2 and by_doc[1][0].chunk_text == "hello world"
    assert by_doc[2][0].n_tokens == 2

    enc = {r.doc_id: r for r in bpe_encode(docs, []).collect()}
    # 'hello world\n' = h,e,l,l,o,</w>,w,o,r,l,d,</w> -> 12, never 14
    assert enc[2].n_bpe_tokens == 12
    assert "" not in enc[2].bpe_tokens
    # token_count agrees across the edge cases
    cnt = {r.doc_id: r.n for r in docs.select(
        "doc_id", token_count(F.col("text")).alias("n")).collect()}
    assert cnt == {1: 2, 2: 2, 3: 1}


def test_corpus_stats_merge_is_exact(spark):
    """Partials from disjoint batches merge to EXACTLY the single-pass
    stats (integer sums are associative -- the incremental-maintenance
    invariant)."""
    from rdf_tabular_spark.ops.text import (
        corpus_stats, corpus_stats_finalize, corpus_stats_merge,
        corpus_stats_partial)

    good = ("the quick brown fox jumps over the lazy dog and then "
            "walks back home to rest for a while with friends")
    docs = spark.createDataFrame(
        [(i, good if i % 3 else "short text", ["en", "fr"][i % 2])
         for i in range(12)],
        "doc_id long, text string, lang string")
    full = {tuple(r) for r in corpus_stats(docs).collect()}
    parts = [corpus_stats_partial(docs.filter(F.col("doc_id") % 4 == i))
             for i in range(4)]
    merged = {tuple(r) for r in corpus_stats_finalize(
        corpus_stats_merge(*parts)).collect()}
    assert merged == full


def test_top_k_per_group_deterministic(spark):
    from rdf_tabular_spark.ops.text import top_k_per_group

    df = spark.createDataFrame(
        [(1, "en", 0.9), (2, "en", 0.9), (3, "en", 0.5), (4, "fr", 0.7)],
        "doc_id long, lang string, quality double")
    got = {(r.lang, r.rank): r.doc_id for r in top_k_per_group(
        df, 2, "lang", "quality", "doc_id").collect()}
    # tie on quality broken by the smaller doc_id
    assert got == {("en", 1): 1, ("en", 2): 2, ("fr", 1): 4}


def test_corpus_length_quantiles(spark):
    from rdf_tabular_spark.ops.text import corpus_length_quantiles

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n), "en") for i, n in enumerate([1, 2, 3, 4])],
        "doc_id long, text string, lang string")
    r = corpus_length_quantiles(docs, qs=(0.5,)).collect()[0]
    assert r.p50_tokens == 2.5  # linear interpolation between 2 and 3


def test_char_entropy(spark):
    import math

    from rdf_tabular_spark.ops.text import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, None)],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_chars_e, r.char_entropy)
           for r in char_entropy(docs).collect()}
    assert got[1] == (4, 0.0)                        # single symbol
    assert got[2] == (4, round(math.log(2), 6))      # two equal symbols
    assert got[3] == (4, round(math.log(4), 6))      # uniform = ln(n)
    assert got[4] == (0, None) and got[5] == (0, None)


def test_fuzzy_decon_engines_agree_and_catch_edits(spark):
    """fast (murmur3) and md5 engines return identical pairs; a
    lightly-edited test copy is flagged while unrelated docs are not."""
    from rdf_tabular_spark.ops.decon import fuzzy_decon_pairs

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark woods tonight")
    train = spark.createDataFrame(
        [(1, base),
         (2, base.replace("lazy", "sleepy")),     # light edit -> flagged
         (3, "completely different content about spark query planning "
             "and shuffle partitions in a distributed engine")],
        "doc_id long, text string")
    test = spark.createDataFrame([(100, base)], "doc_id long, text string")

    fast = {(r["train_id"], r["test_id"]): r["jaccard"]
            for r in fuzzy_decon_pairs(train, test, threshold=0.4).collect()}
    md5 = {(r["train_id"], r["test_id"]): r["jaccard"]
           for r in fuzzy_decon_pairs(train, test, threshold=0.4,
                                      engine="md5").collect()}
    assert fast == md5
    assert (1, 100) in fast and fast[(1, 100)] == 1.0
    assert (2, 100) in fast and fast[(2, 100)] < 1.0
    assert all(t != 3 for t, _ in fast)


def test_gopher_repetition(spark):
    from rdf_tabular_spark.ops.text import gopher_repetition

    docs = [
        # 3 lines, one duplicated (2 copies of 'dup line' = 16 of 24 chars)
        (1, "dup line\nunique middle\ndup line"),
        # 'a b' 2-gram repeats 3x of 5 grams; no duplicate lines
        (2, "a b a b a b"),
        (3, None),
        (4, "   \n  \n"),          # only whitespace lines -> all zeros
        (5, "single"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_repetition(df).collect()}
    assert len(out) == 5
    r1 = out[1]
    assert r1.dup_line_frac == round(1 - 2 / 3, 6)
    assert r1.dup_line_char_frac == round(16 / 29, 6)  # 2*8 of 8+13+8
    r2 = out[2]
    assert r2.top_2gram_frac == 0.6      # 'a b' x3 of 5 grams
    assert r2.dup_line_frac == 0.0
    for d in (3, 4):
        r = out[d]
        assert (r.top_2gram_frac, r.dup_line_frac, r.dup_line_char_frac) \
            == (0.0, 0.0, 0.0)
    assert out[5].top_2gram_frac == 0.0


# ------------------------------------------------------- shard assignment


def test_assign_shards_partition_of_corpus(docs):
    from rdf_tabular_spark.ops.pack import assign_shards

    out = assign_shards(docs, n_shards=8)
    rows = out.collect()
    assert len(rows) == docs.count()  # total assignment
    assert {r.shard for r in rows} == set(range(8))
    ranks = sorted(r.global_rank for r in rows)
    assert ranks == list(range(len(rows)))  # dense global rank


def test_assign_shards_serpentine_stripe(spark):
    from rdf_tabular_spark.ops.pack import assign_shards

    # 8 docs, 4 shards, distinct token counts -> rank = 8-i for doc i
    data = [(f"d{i}", "w " * i) for i in range(1, 9)]
    df = spark.createDataFrame(data, "doc_id string, text string")
    got = {r.doc_id: (r.global_rank, r.shard)
           for r in assign_shards(df, n_shards=4).collect()}
    # descending tokens: d8 r0, d7 r1, ... d1 r7
    assert got["d8"] == (0, 0) and got["d5"] == (3, 3)   # pass 0: 0,1,2,3
    assert got["d4"] == (4, 3) and got["d1"] == (7, 0)   # pass 1 reversed


def test_assign_shards_balance(docs):
    from rdf_tabular_spark.ops.pack import assign_shards, shard_stats

    stats = shard_stats(assign_shards(docs, n_shards=8)).collect()
    toks = [r.total_tokens for r in stats]
    assert len(stats) == 8
    # serpentine striping on sorted sizes: spread bounded by a few of
    # the largest documents; on the sf corpus that is a tight band
    assert (max(toks) - min(toks)) / max(toks) < 0.05


def test_assign_shards_deterministic_across_partitioning(docs):
    from rdf_tabular_spark.ops.pack import assign_shards

    a = sorted(map(tuple, assign_shards(docs.repartition(3), 8).collect()))
    b = sorted(map(tuple, assign_shards(docs.repartition(13), 8).collect()))
    assert a == b


def test_corpus_rollup_levels_consistent(docs):
    from rdf_tabular_spark.ops.text import corpus_rollup

    rows = corpus_rollup(docs).collect()
    detail = [(r.source, r.lang, r.n_docs, r.total_tokens)
              for r in rows if r.source is not None and r.lang is not None]
    per_source = {r.source: (r.n_docs, r.total_tokens)
                  for r in rows if r.source is not None and r.lang is None}
    grand = [r for r in rows if r.source is None and r.lang is None]
    assert len(grand) == 1
    assert grand[0].n_docs == docs.count()
    # subtotals sum exactly to their parents (integer aggregates)
    for src, (nd, tt) in per_source.items():
        assert nd == sum(n for s, _, n, _ in detail if s == src)
        assert tt == sum(t for s, _, _, t in detail if s == src)
    assert grand[0].total_tokens == sum(t for _, t in per_source.values())
