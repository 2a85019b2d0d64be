"""Corpus vocabulary statistics + per-document TF-IDF.

The vocab table (token -> corpus frequency, document frequency) is the
front-end of tokenizer training and frequency-based filtering; TF-IDF
top-k per document is the classic cheap relevance signal.

Scale design:

- ``vocab_counts`` is explode -> hash agg. No explicit salting: COUNT
  aggregation gets map-side partial combine from Catalyst, so a hot token
  ("the") arrives at the final reducer as at most one partial row per
  upstream partition — skew is bounded by the partition count, not the
  token count. (Contrast A3-style set-dedup, where salting IS needed —
  see agg_salted_counts.)
- ``doc_freq`` dedups (doc, token) BEFORE the per-token count, so the
  reducer again sees pre-combined partials, never one row per occurrence.
- ``tfidf_topk`` ranks on the 6-dp ROUNDED tfidf score (descending) with
  the integer (tf DESC, df ASC, token ASC) key as tiebreak.  Ranking on
  the rounded score keeps the emitted rank consistent with the emitted
  tfidf column, while the rounding + integer tiebreak keeps row selection
  portable across engines: the raw ln() differs in the last ulp between
  engines, but at 6 dp both round to the same value (the oracle
  hash-compares the rounded column, so any divergence would already
  fail), and equal rounded scores order by the integer key.  The per-doc
  window partitions on doc_id — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import normalize_text, tokens


def _doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(normalize_text(F.col(text_col)))).alias("token"))
        .filter(F.col("token") != "")
    )


def vocab_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", min_count: int = 1) -> DataFrame:
    """(token, term_freq, doc_freq) over the normalized corpus.

    Single pass: one (doc, token) pre-aggregation, then term_freq =
    SUM(tf) and doc_freq = COUNT(*) over it — the distinct-(doc, token)
    set IS the key set of the first agg, so no second corpus scan and no
    join (the first cut of this op scanned the corpus twice and joined;
    .explain showed both scans).
    """
    per_doc = (
        _doc_tokens(docs, text_col, id_col)
        .groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    )
    out = per_doc.groupBy("token").agg(
        F.sum("tf").alias("term_freq"),
        F.count("*").alias("doc_freq"))
    if min_count > 1:
        out = out.filter(F.col("term_freq") >= min_count)
    return out


def tfidf_topk(docs: DataFrame, k: int = 5, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Top-k tokens per document by smoothed TF-IDF.

    score = tf * (ln((N + 1) / (df + 1)) + 1), reported rounded to 6dp;
    ranking is on the rounded score with an engine-portable integer
    tiebreak (see module docstring).
    """
    from ..caching import cache_bounded as _cache

    dt = _doc_tokens(docs, text_col, id_col)
    n_docs = docs.select(F.col(id_col)).distinct().count()
    # tf is referenced twice (per-doc rows + the df rollup), so persist it
    # through the bounded near-dup cache registry rather than re-exploding
    # the corpus; df then derives from tf (its keys ARE the distinct
    # (doc, token) set) — one corpus scan total.
    tf = _cache(dt.groupBy("doc_id", "token").agg(F.count("*").alias("tf")))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    # vocab side is |distinct tokens| — broadcast when small; at corpus
    # scale Catalyst/AQE picks the shuffle join, which is keyed on token
    # and pre-combined, so it stays balanced
    scored = tf.join(df_, "token").select(
        "doc_id", "token", "tf", "df",
        F.round(
            F.col("tf")
            * (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(),
        F.col("tf").desc(), F.col("df").asc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "token", "tf", "df", "tfidf")
    )


def oov_rate(docs: DataFrame, vocab_k: int = 1000, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-K
    vocabulary (tokenizer/coverage planning: how much of each doc falls
    outside the K most frequent tokens).

    Top-K selection orders on (term_freq DESC, token) — deterministic
    boundary — via orderBy + limit, which compiles to
    TakeOrderedAndProject (per-partition heap + driver merge of K rows;
    never a global sort or a no-partition window). The doc side explodes
    once and left-joins the broadcast vocabulary, then one per-doc hash
    agg. Counts are integers; the rate divides after the agg.
    """
    counts = vocab_counts(docs, text_col, id_col).select(
        "token", "term_freq")
    topk = (counts.orderBy(F.desc("term_freq"), "token").limit(vocab_k)
            .select("token", F.lit(True).alias("in_vocab")))
    dt = _doc_tokens(docs, text_col, id_col)
    joined = dt.join(F.broadcast(topk), "token", "left")
    per_doc = joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .alias("n_oov"))
    # start from the document set: an empty/NULL doc has no tokens and
    # would silently vanish from a "per-document" metric otherwise
    ids = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
        F.when(F.col("n_tokens") > 0,
               F.round(F.col("n_oov") / F.col("n_tokens"), 6))
        .alias("oov_rate"))
