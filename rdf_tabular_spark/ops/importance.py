"""DSIR-style data selection: hashed-n-gram importance weights.

Data Selection with Importance Resampling (Xie et al.,
arXiv:2302.03169) scores every raw document by how much more likely its
features are under a *target* distribution (the high-quality / in-domain
subset you want more of) than under the raw corpus, then resamples by
that weight. The feature model is a bag of HASHED unigrams — hashing
caps the parameter table at a fixed bucket count, which is what makes
the method run at 100 TB: the per-bucket log-ratio table is a
``buckets``-row broadcast, never a corpus-sized vocabulary.

Engine-portable determinism (same conventions as ops/text.py
``ngram_lm_score``):

- Bucketing uses the md5 convention of ops/split.hash_bucket, so the
  DuckDB oracle replays it bit-for-bit.
- Each bucket's log-ratio is quantized ONCE to integer micro-nats
  (``round(ln(p_target/p_raw) * 1e6)`` as BIGINT) in the bucket table;
  per-document scores are integer sums of those constants, so the
  result is independent of partitioning, join order, and float
  summation order.

Scale shape: one corpus tokenize+explode into narrow (bucket) rows,
ONE map-side-combined aggregation building the bucket table (bounded at
``buckets`` rows — a hot token saturates its partial aggregates, never a
reducer), broadcast back, and a second map-only pass computes per-doc
sums via an array fold over the broadcast map. The corpus text is read
twice at most (once if the caller caches the token arrays), shuffled
never.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .split import hash_bucket
from .text import normalize_text


def _bucket(tok: Column, buckets: int) -> Column:
    return hash_bucket(tok, salt="dsir", buckets=buckets)


def _tokens(text: Column) -> Column:
    toks = F.split(normalize_text(F.coalesce(text, F.lit(""))), " ")
    return F.filter(toks, lambda t: t != "")


def hashed_bucket_logratios(docs: DataFrame, target_filter: str,
                            buckets: int = 4096,
                            text_col: str = "text") -> DataFrame:
    """The per-bucket importance table: (bucket, n_target, n_raw,
    logratio_micronats).

    ``target_filter`` is a SQL boolean over the document columns naming
    the target subset (it stays part of the raw corpus — DSIR's raw
    distribution is the full corpus). Add-one smoothing on both sides
    keeps never-seen buckets finite; the ratio uses total counts + the
    bucket count as denominators, i.e. Laplace over the hashed feature
    space."""
    toks = docs.select(
        F.expr(target_filter).alias("_is_target"),
        F.explode(_tokens(F.col(text_col))).alias("_tok"))
    per_bucket = (
        toks.select(_bucket(F.col("_tok"), buckets).alias("bucket"),
                    F.col("_is_target"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_raw"),
             F.sum(F.when(F.col("_is_target"), 1).otherwise(0))
             .alias("n_target")))
    tot = per_bucket.agg(
        F.sum("n_raw").alias("_tr"), F.sum("n_target").alias("_tt"))
    ratio = (
        F.log((F.col("n_target") + 1)
              / (F.col("_tt") + F.lit(float(buckets))))
        - F.log((F.col("n_raw") + 1) / (F.col("_tr") + F.lit(float(buckets))))
    )
    return (
        per_bucket.crossJoin(F.broadcast(tot))
        .select("bucket", "n_target", "n_raw",
                F.round(ratio * 1e6).cast("long").alias("logratio_micronats"))
    )


def importance_weights(docs: DataFrame, target_filter: str,
                       buckets: int = 4096, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-document DSIR importance score: the integer micro-nat sum of
    its tokens' bucket log-ratios, plus the 6-dp per-token average
    (length-normalized, the form you threshold on).

    The bucket table is broadcast and applied with one explode-free
    aggregate fold per document — the scoring pass is map-only."""
    table = hashed_bucket_logratios(docs, target_filter, buckets, text_col)
    rows = table.select("bucket", "logratio_micronats").collect()
    # bounded driver materialization: exactly `buckets` rows by
    # construction, independent of corpus size (same pattern as the
    # ngram_lm_score broadcast LM)
    lut = F.map_from_arrays(
        F.array(*[F.lit(int(r["bucket"])) for r in rows]),
        F.array(*[F.lit(int(r["logratio_micronats"])) for r in rows]))
    toks = _tokens(F.col(text_col))
    score = F.aggregate(
        F.transform(toks, lambda t: F.element_at(
            lut, _bucket(t, buckets).cast("int"))),
        F.lit(0).cast("long"), lambda acc, x: acc + F.coalesce(x, F.lit(0)))
    n = F.size(toks)
    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        score.alias("logratio_micronats"),
        F.round(F.when(n > 0, score / n / 1e6).otherwise(F.lit(0.0)), 6)
        .alias("per_token_logratio"))


def resample_by_importance(weights: DataFrame, fraction: float,
                           id_col: str = "doc_id") -> DataFrame:
    """Deterministic top-weight selection: keep the ``fraction`` of
    documents with the highest per-token log-ratio (ties broken by id —
    total order, engine-portable). DSIR proper resamples with Gumbel
    noise; at production scale the noiseless top-k is the common
    deployment (and the only reproducible one). The cutoff is computed
    from an exact rank so reruns and engines agree bit-for-bit.

    Scale: rank via one window per band of the 6-dp score (the score is
    already quantized, so bands are value-based and deterministic) —
    same single-partition-window-free composition as
    ops/pack.assign_shards, reused here on the narrow weights table.
    """
    if not 0 < fraction <= 1:
        raise ValueError("fraction must be in (0, 1]")
    from pyspark.sql import Window

    # exact count once (cheap driver scalar on the narrow table)
    total = weights.count()
    keep = max(1, int(fraction * total))
    w_cell = Window.partitionBy("per_token_logratio").orderBy(id_col)
    cells = weights.groupBy("per_token_logratio").agg(
        F.count(F.lit(1)).alias("_cnt"))
    w_off = (Window.orderBy(F.desc("per_token_logratio"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = cells.select(
        "per_token_logratio",
        (F.sum("_cnt").over(w_off) - F.col("_cnt")).alias("_off"))
    ranked = weights.join(F.broadcast(offsets), ["per_token_logratio"]) \
        .withColumn("_rank", F.col("_off") + F.row_number().over(w_cell) - 1)
    return ranked.filter(F.col("_rank") < keep).drop("_off", "_rank")
