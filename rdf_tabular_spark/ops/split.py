"""Deterministic dataset splitting and sampling.

Train/val/test assignment and per-stratum downsampling for a training
corpus must be (a) reproducible run-to-run and cluster-size-invariant,
(b) stable under re-partitioning and resume, and (c) map-only — a
100 TB corpus cannot afford a shuffle just to get split labels. All ops
here hash the row KEY (never the partition or row position — Spark's
``randomSplit``/``sample`` are seed-stable only for a fixed partition
layout) into an integer bucket, so assignment is a pure per-row
expression: no shuffle, no state, and adding files to the corpus never
reassigns existing rows.

The bucket is the first 8 hex chars of md5(key|salt) — the same
engine-portable convention as ops/pack.py sharding — taken mod 10_000,
giving 0.01 % assignment granularity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(key: Column, salt: str | None,
                buckets: int = BUCKETS) -> Column:
    """Engine-portable uniform bucket in [0, buckets): first 8 hex chars
    of md5(key[|salt]) as an integer, mod buckets. The single home of the
    cross-engine hashing convention — ops/pack.py sharding uses it too.

    NULL keys hash as the sentinel ``'__null__'`` rather than propagating
    NULL: without this, every NULL-keyed row would silently fall into a
    split's ``otherwise`` branch (or vanish from a sampled stratum) — the
    assignment must stay total and deterministic for malformed rows too.
    """
    keyed = F.coalesce(key.cast("string"), F.lit("__null__"))
    if salt is not None:
        keyed = F.concat(keyed, F.lit("|" + salt))
    return F.pmod(
        F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long"),
        F.lit(buckets))


def hash_split(df: DataFrame, weights: list[tuple[str, float]] | None = None,
               key_col: str = "doc_id", salt: str = "split",
               out_col: str = "split") -> DataFrame:
    """Assign each row to a named split with the given weights.

    *weights* is an ordered list of (name, weight); weights are
    normalized. Cut points are integer bucket thresholds, so the split is
    exact to 1/BUCKETS and every engine computing the same md5 agrees.
    """
    if weights is None:
        weights = [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    total = sum(w for _, w in weights)
    bucket = hash_bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    for name, w in weights[:-1]:
        acc += w / total
        cut = int(round(acc * BUCKETS))
        cond = bucket < cut
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = weights[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      strata_col: str, key_col: str = "doc_id",
                      salt: str = "sample",
                      default_fraction: float = 0.0) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows.

    *fractions* maps stratum value -> keep fraction; strata not listed
    keep *default_fraction*. Pure filter — map-only, no shuffle, and the
    kept set for a stratum is a SUBSET of the kept set for any higher
    fraction (nested samples: raising 5 % to 10 % only adds rows), which
    is what reproducible ablations want.
    """
    bucket = hash_bucket(F.col(key_col), salt)
    cut = None
    for value, frac in fractions.items():
        thr = int(round(frac * BUCKETS))
        cond = F.col(strata_col) == value
        cut = F.when(cond, thr) if cut is None else cut.when(cond, thr)
    cut = (F.lit(int(round(default_fraction * BUCKETS)))
           if cut is None else cut.otherwise(int(round(default_fraction * BUCKETS))))
    return df.filter(bucket < cut)


def leakage_safe_split(df: DataFrame,
                       weights: list[tuple[str, float]] | None = None,
                       cluster_col: str = "cluster_id", salt: str = "split",
                       out_col: str = "split") -> DataFrame:
    """:func:`hash_split` keyed on the near-dup CLUSTER id instead of the
    document id: every member of a duplicate cluster lands in the SAME
    split, so a near-copy of a test document can never leak into train
    (the classic eval-contamination path that per-doc splitting leaves
    open). Composition point for ops/dedup.dedup_clusters output — run
    the pair finder, elect clusters, then split on the cluster key.
    Still map-only over the clustered corpus: the md5 bucket is a pure
    per-row expression on *cluster_col*."""
    return hash_split(df, weights, key_col=cluster_col, salt=salt,
                      out_col=out_col)


def weighted_sample(df: DataFrame, weight_col: str,
                    key_col: str = "doc_id", salt: str = "wsample",
                    scale: float = 1.0) -> DataFrame:
    """Keep each row with probability ``min(1, weight * scale)``,
    deterministically: row KEY hashed to a bucket, kept iff
    bucket < weight*scale*BUCKETS. The quality-proportional mixing
    primitive (sample high-quality docs at full rate, low-quality at
    their score) — map-only, partition/cluster-size invariant, and
    monotone in *scale* (raising it only ADDS rows, so up-weighted
    reruns are supersets — the property ablation studies need).
    Weights are expected in [0, 1] after scaling; values above 1 keep
    the row always (no replication — use explode for over-sampling)."""
    bucket = hash_bucket(F.col(key_col), salt)
    # NULL weight -> 0 (dropped): F.least skips NULLs, so an unguarded
    # NULL would collapse the cut to BUCKETS and keep the row at 100% --
    # the opposite of a conservative default for malformed rows
    w = F.coalesce(F.col(weight_col), F.lit(0.0))
    cut = F.least(F.round(w * scale * BUCKETS), F.lit(float(BUCKETS)))
    return df.filter(bucket < cut)


def source_quota_sample(df: DataFrame, quota: int,
                        source_col: str = "source",
                        key_col: str = "doc_id",
                        salt: str = "quota") -> DataFrame:
    """Per-source document cap — the per-domain quota step of a
    pretraining mix (no single domain/source may dominate the corpus).
    Keeps at most *quota* rows per source, chosen by a deterministic
    md5 ranking of the row KEY (never physical layout), so the same
    quota on the same corpus always keeps the same rows.

    One shuffle, keyed by source. At web scale the key space (registrable
    domains) is ~10^7-wide, so partitions balance; a single hot source is
    bounded by the quota itself — Spark rewrites the rank<=k filter into
    WindowGroupLimit, which keeps a per-partition top-k heap on the map
    side and never materializes a hot source's full row list on one
    reducer."""
    from pyspark.sql import Window

    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.concat(F.coalesce(F.col(key_col).cast("string"),
                                  F.lit("__null__")),
                       F.lit("|" + salt))),
        F.col(key_col),
    )
    return (
        df.withColumn("_quota_rank", F.row_number().over(w))
        .filter(F.col("_quota_rank") <= quota)
        .drop("_quota_rank")
    )


def rebalance_mix(df: DataFrame, target_fracs: dict[str, float],
                  source_col: str = "source",
                  key_col: str = "doc_id", salt: str = "mix") -> DataFrame:
    """Downsample toward a target source mix ("30% code / 50% web /
    20% books"). Source *s* with ``n_s`` rows and target fraction
    ``f_s`` keeps each row with probability ``p_s = f_s * T / n_s``
    where ``T = min_s(n_s / f_s)`` — the largest output size at which
    every requested fraction is reachable by downsampling alone (the
    scarcest source keeps 100%). Sources absent from the target are
    dropped.

    Keeps are md5-deterministic per row key (layout-/cluster-invariant,
    rerunnable). Cost: one map-side-combined count per source (rows =
    #sources, driver-bounded like k-means centroids), then a map-only
    filter with the per-source cut folded in as a literal map — no join,
    no second shuffle of the corpus."""
    counts = {r[0]: r[1]
              for r in df.groupBy(source_col).count().collect()}
    t = min(counts[s] / f for s, f in target_fracs.items()
            if f > 0 and s in counts)
    cuts = []
    for s, f in sorted(target_fracs.items()):
        if s not in counts or f <= 0:
            continue
        p = min(1.0, f * t / counts[s])
        # floor, not round: half-even vs half-away rounding differs
        # across engines; floor keeps the cut reproducible everywhere
        cuts.extend([F.lit(s), F.lit(float(int(p * BUCKETS)))])
    cut = F.element_at(F.create_map(*cuts), F.col(source_col))
    bucket = hash_bucket(F.col(key_col), salt)
    return df.filter(cut.isNotNull() & (bucket < cut))


def temperature_mix(df: DataFrame, alpha: float = 0.3,
                    group_col: str = "lang", key_col: str = "doc_id",
                    salt: str = "temp") -> DataFrame:
    """Temperature-scaled group rebalancing — the multilingual sampling
    standard (XLM-R / mT5 shape): target share of group *l* is
    ``p_l ∝ n_l^alpha``, flattening the head and up-weighting the tail
    as alpha → 0 (alpha = 1 keeps natural proportions).

    Downsampling-only realization, same construction as
    :func:`rebalance_mix`: with target fractions ``f_l = n_l^alpha /
    Σ n^alpha``, the largest reachable output is ``T = min_l(n_l/f_l)``
    and each group keeps ``p_l = f_l * T / n_l`` of its rows via the
    md5 row-key cut — deterministic, layout-invariant, no upsampling
    (repetition policy belongs to the training loader, not the corpus).

    Cost: one map-side-combined count per group (driver-bounded), then
    a map-only literal-map filter — the corpus never joins or
    re-shuffles."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    counts = {r[0]: r[1] for r in df.groupBy(group_col).count().collect()
              if r[0] is not None}
    if not counts:
        return df.filter(F.lit(False))
    weights = {g: n ** alpha for g, n in counts.items()}
    # fixed summation order: float addition is not associative, and dict
    # insertion order follows the nondeterministic collect() row order —
    # a one-ULP shift in z could flip an integer bucket cut
    z = sum(weights[g] for g in sorted(weights))
    fracs = {g: w / z for g, w in weights.items()}
    # the limiting group (argmin of n/f, ties broken on the sorted group
    # name) keeps EXACTLY everything — assign p = 1.0 rather than a
    # ratio that lands one ULP under it (the SQL twin applies the same
    # rule with the same tie-break)
    g_lim = min(sorted(counts), key=lambda g: counts[g] / fracs[g])
    t = counts[g_lim] / fracs[g_lim]
    cuts = []
    for g in sorted(counts):
        p = 1.0 if g == g_lim else min(1.0, fracs[g] * t / counts[g])
        # floor for cross-engine reproducibility (see rebalance_mix)
        cuts.extend([F.lit(g), F.lit(float(int(p * BUCKETS)))])
    cut = F.element_at(F.create_map(*cuts), F.col(group_col))
    bucket = hash_bucket(F.col(key_col), salt)
    return df.filter(cut.isNotNull() & (bucket < cut))


def select_token_budget(df: DataFrame, budget_tokens: int,
                        id_col: str = "doc_id",
                        quality_col: str = "quality_micro",
                        tokens_col: str = "n_tokens") -> DataFrame:
    """Maximal-quality corpus selection under a total token budget: take
    documents in the declared order — *quality_col* DESC, then
    ``(md5(id), id)`` ASC within a quality tie (an arbitrary-but-
    deterministic tiebreak; tied docs are interchangeable by
    definition) — and keep the maximal prefix whose cumulative
    *tokens_col* stays ≤ *budget_tokens*. The "fill the training-token
    budget with the best data first" selection step of an LLM data
    pipeline (the budget-constrained counterpart of top_k_per_group).

    The naive formulation is a GLOBAL ordered cumulative-sum window —
    a total sort of the corpus through one reducer, unusable at 10^12
    docs. This computes the identical set with bounded driver state and
    NO global window, by binary-searching the order statistic in two
    aggregation rounds:

    1. per-quality histogram (Σ tokens, one map-side-combined agg over
       the score domain — micro-quantized scores have vocabulary-sized
       domains) → driver prefix-sum finds the threshold quality q*:
       every doc with quality > q* fits; the q* bucket is boundary.
    2. the boundary bucket alone is re-aggregated into 256 md5-prefix
       ranges (which are CONTIGUOUS under the declared (md5, id)
       order) → driver prefix-sum finds the boundary range r* and the
       tokens remaining for it.
    3. ONE cumulative window runs over the boundary range only —
       |bucket|/256 rows; each extra refinement level divides the
       windowed set by 256 again, so two levels bound it at
       |corpus|/65536 (add levels for adversarial distributions).

    Everything reaching the driver is a histogram (≤ |score domain| and
    256 rows); the corpus itself sees two filters and one bounded-range
    window. Zero-token docs inside the boundary range are kept when
    they tie exactly at the cut, matching the prefix rule (cumulative
    sums are non-decreasing, so "cum ≤ budget" IS the maximal prefix).
    """
    q, t, i = F.col(quality_col), F.col(tokens_col), F.col(id_col)
    # budget 0 is NOT empty: zero-token docs ride a zero budget (the
    # prefix rule admits every row with cum <= budget) — found by the
    # Hypothesis replay; only a negative budget short-circuits
    if budget_tokens < 0:
        return df.select(id_col, quality_col, tokens_col).filter(F.lit(False))
    from rdf_tabular_spark.caching import cache_bounded

    # ONE evaluation of the upstream plan: this function takes five
    # actions/branches over *df* (two driver histograms + three keep
    # branches); without a persist an expensive or non-deterministic
    # upstream is recomputed per action, and the histogram and filter
    # views could disagree. Cache the 3-column projection (bounded
    # registry — evicted after a few newer operator caches).
    proj = cache_bounded(df.select(id_col, quality_col, tokens_col))
    hist = sorted(
        ((r[0], r[1]) for r in
         proj.groupBy(quality_col).agg(F.sum(tokens_col).alias("s"))
         .collect()),
        key=lambda x: -x[0])
    cum = 0
    q_star, s_hi = None, 0
    for qv, s in hist:
        if cum + s > budget_tokens:
            q_star, s_hi = qv, cum
            break
        cum += s
    if q_star is None:
        return proj  # all fit
    keep_hi = proj.filter(q > F.lit(q_star))
    # the boundary bucket is itself read twice (range histogram + the
    # keep_mid/keep_cut branches) — cache it too; it is 1/|score domain|
    # of the corpus
    boundary = cache_bounded(
        proj.filter(q == F.lit(q_star)).withColumn(
            "_hx", F.md5(i.cast("string"))))
    rem = budget_tokens - s_hi
    ranges = sorted(
        (r[0], r[1]) for r in boundary
        .groupBy(F.substring("_hx", 1, 2).alias("hp"))
        .agg(F.sum(tokens_col).alias("s")).collect())
    cum2 = 0
    r_star, s_lo = None, 0
    for hp, s in ranges:
        if cum2 + s > rem:
            r_star, s_lo = hp, cum2
            break
        cum2 += s
    if r_star is None:
        return keep_hi.unionByName(
            boundary.select(id_col, quality_col, tokens_col))
    keep_mid = boundary.filter(F.substring("_hx", 1, 2) < r_star).select(
        id_col, quality_col, tokens_col)
    from pyspark.sql import Window

    # bounded window: only the boundary md5-prefix range (1/65536 of the
    # corpus per refinement level squared); single partition by design,
    #|range| rows
    w = (Window.orderBy("_hx", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    keep_cut = (
        boundary.filter(F.substring("_hx", 1, 2) == r_star)
        .withColumn("_cum", F.sum(tokens_col).over(w))
        .filter(F.col("_cum") <= rem - s_lo)
        .select(id_col, quality_col, tokens_col)
    )
    return keep_hi.unionByName(keep_mid).unionByName(keep_cut)
