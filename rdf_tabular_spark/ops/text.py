"""Text analysis operators: token counting, quality scoring, language id,
document fingerprinting. All pure column expressions (JVM-side), each with
an ANSI-SQL twin for the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "est"],
    "de": ["der", "die", "das", "und", "ist"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS = ["the", "a", "an", "of", "to", "in", "is", "and", "or", "for"]


def normalize_text(c: Column) -> Column:
    """Lowercase + collapse ALL whitespace runs to single spaces + trim.
    Collapse happens BEFORE the trim: ``trim`` strips only spaces (0x20),
    so trimming first leaves a leading/trailing "\n"/"\t" behind as a
    phantom empty token after the split (review r2 — silently dropped
    chunker docs and inflated token counts)."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(c: Column) -> Column:
    return F.split(F.trim(c), r"\s+")


def nonempty_tokens(c: Column) -> Column:
    """Whitespace-robust token array: normalize, split, and drop empty
    tokens (an empty/NULL document yields [] — never ['']). The single
    home for token extraction in ops that must not see phantom tokens
    (review r2: three call sites each re-derived this and two got it
    wrong)."""
    return F.filter(
        F.split(normalize_text(F.coalesce(c, F.lit(""))), " "),
        lambda t: t != "")


def token_count(c: Column) -> Column:
    # NULL text counts as an empty document (0 tokens) and phantom empty
    # tokens from edge whitespace are excluded: trim() strips only 0x20,
    # so '\nhello' would otherwise split to ['', 'hello'] and count 2
    c = F.coalesce(c, F.lit(""))
    return F.size(F.filter(tokens(c), lambda t: t != ""))


def bpe_ish_token_count(c: Column) -> Column:
    """Sub-word-ish token count: words + digits + punctuation runs, the
    standard BPE-approximating regex."""
    arr = F.regexp_extract_all(
        F.lower(F.coalesce(c, F.lit(""))),
        F.lit(r"([a-z]{1,6}|\d{1,3}|[^a-z\d\s])"), 1)
    return F.size(arr)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.coalesce(F.col(text_col), F.lit(""))  # NULL text = empty doc
    toks = tokens(c)
    n_tok = token_count(c)
    n_char = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()]", ""))
    stop_hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    mean_word_len = F.when(n_tok > 0, (F.length(F.regexp_replace(c, r"\s+", "")) / n_tok))
    return df.withColumns({
        "n_chars_m": n_char.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "punct_ratio": F.round(punct / F.greatest(n_char, F.lit(1)), 6),
        "stopword_ratio": F.round(stop_hits / F.greatest(n_tok, F.lit(1)), 6),
        "mean_word_len": F.round(F.coalesce(mean_word_len, F.lit(0.0)), 6),
    })


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score from the standard length/punct/stopword
    heuristics (training-data filtering baseline)."""
    qf = quality_features(df, text_col)
    length_ok = F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 1.0).otherwise(0.2)
    punct_ok = F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.5)
    word_ok = F.when((F.col("mean_word_len") >= 2) & (F.col("mean_word_len") <= 12), 1.0).otherwise(0.3)
    return qf.withColumn(
        "quality", F.round((length_ok + punct_ok + word_ok) / 3.0, 6))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-lexicon language id: per language, count marker-token hits;
    argmax (deterministic tie-break by language code)."""
    toks = tokens(F.lower(F.col(text_col)))

    # NB: the lambda must take exactly one parameter — PySpark binds a second
    # parameter of a higher-order-function lambda to the element *index*.
    def marker_hits(markers: list[str]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = [
        F.struct(
            marker_hits(markers).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    # array_max picks highest hits; struct comparison breaks ties on the
    # SECOND field ascending — reverse tie-break via negated lang is overkill:
    # keep (hits, lang) and accept lexicographically-largest lang on ties.
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")))


def fingerprint(df: DataFrame, text_col: str = "text", k: int = 4) -> DataFrame:
    """Document fingerprints: (a) md5 of the normalized text (exact); (b) a
    winnowing-style shingle fingerprint = min md5 over word k-shingles.
    md5 on purpose: DuckDB computes the identical value."""
    # tokenizer staged through a projection boundary: expressions captured
    # in a higher-order-function lambda are duplicated per use-site, so an
    # inline split would re-run its regex chain for every shingle element
    staged = df.withColumns({
        "_norm": normalize_text(F.col(text_col)),
    }).withColumns({"_toks": F.split(F.col("_norm"), " ")})
    toks = F.col("_toks")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1)))
    shingle_hashes = F.transform(
        idx, lambda i: F.md5(F.array_join(F.slice(toks, i, k), " ")))
    return staged.withColumns({
        "fp_exact": F.md5(F.col("_norm")),
        "fp_min_shingle": F.array_min(shingle_hashes),
    }).drop("_norm", "_toks")


def repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals:

    - ``top_word_frac``: multiplicity of the most frequent (normalized)
      token / token count;
    - ``dup_2gram_frac``: 1 - distinct word 2-grams / total 2-grams.

    NULL text counts as an empty document. Both are pure per-row array
    expressions (no explode, no shuffle): the
    token histogram's max is a single fold over the SORTED token array —
    equal tokens are adjacent after ``array_sort``, so the longest run IS
    the top multiplicity.  At 100 TB this stays a map-only pass inside
    whole-stage codegen, where the textbook explode → groupBy(doc, token)
    formulation would shuffle the tokenized corpus (≈2-3× the corpus
    bytes)."""
    staged = df.withColumns({
        "_norm": normalize_text(F.coalesce(F.col(text_col), F.lit(""))),
    }).withColumns({"_toks": F.split(F.col("_norm"), " ")})
    toks = F.col("_toks")
    n_tok = F.when(F.col("_norm") == "", F.lit(0)).otherwise(F.size(toks))

    zero = F.lit(0).cast("long")
    run_state = F.aggregate(
        F.array_sort(toks),
        F.struct(F.lit("").alias("prev"), zero.alias("run"),
                 zero.alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            .cast("long").alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
                .cast("long")).alias("best")),
    )["best"]

    # adjacent-pair 2-grams via zip_with over two shifted slices. The
    # token array must NEVER be referenced inside the lambda: filter
    # pushdown substitutes column aliases into predicates with no cost
    # check, so a lambda-captured `toks` would re-run the split PER
    # ELEMENT after a downstream .filter("keep") — measured 16x slower
    # on the curation pipeline. Lambda args only -> the inlined split
    # runs a constant number of times per row.
    n_pairs = F.greatest(F.size(toks) - 1, F.lit(0))
    grams2 = F.zip_with(
        F.slice(toks, 1, n_pairs),
        F.slice(toks, 2, n_pairs),
        lambda a, b: F.concat(a, F.lit(" "), b))
    n_2g = F.size(grams2)

    return staged.withColumns({
        "n_tokens": n_tok.cast("long"),
        "top_word_frac": F.round(
            F.when(n_tok > 0, run_state / n_tok).otherwise(F.lit(0.0)), 6),
        "dup_2gram_frac": F.round(
            F.when(n_2g > 0,
                   1.0 - F.size(F.array_distinct(grams2)) / n_2g)
            .otherwise(F.lit(0.0)), 6),
    }).drop("_norm", "_toks")


def quality_filter(df: DataFrame, text_col: str = "text",
                   min_tokens: int = 10, max_tokens: int = 100_000,
                   max_punct_ratio: float = 0.2,
                   min_stopword_ratio: float = 0.0,
                   max_top_word_frac: float = 0.3,
                   max_dup_2gram_frac: float = 0.3) -> DataFrame:
    """Composed C4/Gopher-style document filter: one keep/drop decision
    with per-rule reasons, built from :func:`quality_features` +
    :func:`repetition_metrics` (length band, punctuation ratio, stopword
    floor, top-word and duplicate-2-gram repetition caps).

    Adds ``drop_reasons array<string>`` (empty = keep) and ``keep``.
    ``filter(keep)`` is the cleaned corpus; the reasons channel feeds the
    same rejected-rows accounting as the CSVW error channel (C11) —
    curation decisions must be auditable, not silent. Everything is
    per-row column expressions over one pass: map-only, no shuffle,
    whole-stage codegen end-to-end — at 100 TB this runs at scan speed.
    Thresholds compare the 6-dp ROUNDED ratios the feature ops emit, so
    any engine reproducing those features reproduces the decision."""
    feats = repetition_metrics(quality_features(df, text_col), text_col)
    reasons = F.array_compact(F.array(
        F.when(~F.col("n_tokens").between(min_tokens, max_tokens),
               F.lit("length")),
        F.when(F.col("punct_ratio") > max_punct_ratio, F.lit("punct")),
        F.when(F.col("stopword_ratio") < min_stopword_ratio,
               F.lit("stopwords")),
        F.when(F.col("top_word_frac") > max_top_word_frac,
               F.lit("top_word")),
        F.when(F.col("dup_2gram_frac") > max_dup_2gram_frac,
               F.lit("dup_2gram")),
    ))
    return feats.withColumns({
        "drop_reasons": reasons,
        "keep": F.size(reasons) == 0,
    })


def ngram_lm_score(docs: DataFrame, lm_docs: DataFrame | None = None,
                   text_col: str = "text", id_col: str = "doc_id",
                   alpha: float = 0.4) -> DataFrame:
    """Corpus-trained bigram LM scoring (perplexity-proxy quality signal):
    train unigram/bigram counts on *lm_docs* (default: the docs
    themselves; in a real pipeline, the TRAIN split), then score every
    document's mean bigram log-probability under stupid backoff:

        P(w2|w1) = C(w1 w2)/C(w1)            if the bigram was seen
                 = alpha * C(w2)/N           else if w2 was seen
                 = alpha^2 / N               else (unseen word)

    Returns (id_col, n_bigrams, lm_score) with lm_score = mean ln P,
    NULL for docs with no bigrams. Low scores flag gibberish/boilerplate
    the length/ratio heuristics miss — the modern curation signal next
    to :func:`quality_filter`.

    Determinism at scale: a per-doc SUM of doubles is partition-order
    dependent (double addition is not associative), so each term is
    quantized to integer micro-nats (round(ln p * 1e6) as BIGINT) BEFORE
    the aggregate — integer sums are associative, so the score is
    bit-identical under any partitioning and any engine agreeing on ln.
    Shape: two map-side-combined hash aggs train the LM; scoring is one
    explode + two key joins (bigram, unigram — broadcast when the vocab
    is small, AQE-skew-split when a hot bigram isn't) + an integer sum.
    """
    lm = lm_docs if lm_docs is not None else docs
    norm = normalize_text(F.col(text_col))

    def doc_bigrams(df: DataFrame) -> DataFrame:
        staged = df.withColumn("_toks", F.split(norm, " ")).filter(
            (F.trim(F.col(text_col)) != "") & (F.size("_toks") >= 2))
        zipped = F.arrays_zip(
            F.slice("_toks", 1, F.size("_toks") - 1).alias("w1"),
            F.expr("slice(_toks, 2, size(_toks) - 1)").alias("w2"))
        return staged.select(F.col(id_col), F.explode(zipped).alias("bg")) \
            .select(id_col, F.col("bg.w1").alias("w1"),
                    F.col("bg.w2").alias("w2"))

    def unigrams(df: DataFrame) -> DataFrame:
        staged = df.withColumn("_toks", F.split(norm, " ")).filter(
            F.trim(F.col(text_col)) != "")
        return staged.select(F.explode("_toks").alias("w")) \
            .groupBy("w").agg(F.count("*").alias("c1"))

    uni = unigrams(lm)
    big = doc_bigrams(lm).groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    total = uni.agg(F.sum("c1").alias("n_total"))  # 1 row, broadcast join

    scored = (
        doc_bigrams(docs)
        .join(big, ["w1", "w2"], "left")
        .join(uni.select(F.col("w").alias("w1"), F.col("c1").alias("c1w1")),
              "w1", "left")
        .join(uni.select(F.col("w").alias("w2"), F.col("c1").alias("c1w2")),
              "w2", "left")
        .crossJoin(F.broadcast(total))
    )
    p = (
        F.when(F.col("c2").isNotNull(), F.col("c2") / F.col("c1w1"))
        .when(F.col("c1w2").isNotNull(),
              F.lit(alpha) * F.col("c1w2") / F.col("n_total"))
        .otherwise(F.lit(alpha * alpha) / F.col("n_total"))
    )
    qln = F.round(F.log(p) * 1e6).cast("long")
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.sum(qln).alias("_qsum"))
    ids = docs.select(id_col).distinct()
    return (
        ids.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round(F.col("_qsum") / F.col("n_bigrams") / 1e6, 6)
            .alias("lm_score"),
        )
    )


def corpus_stats(df: DataFrame, text_col: str = "text",
                 group_col: str = "lang", **filter_kwargs) -> DataFrame:
    """Dataset-card rollup: per *group_col* (language, source, split...),
    document/token totals and the :func:`quality_filter` keep rate — the
    table every dataset release note starts with.

    One grouped aggregation over the map-only feature pass (partial+final
    hash agg, no extra shuffle beyond the group key). Every aggregate is
    integer-based (counts, token sums) with ratios derived AFTER the agg,
    so the result is bit-identical under any partitioning — no
    order-dependent double summation anywhere.
    """
    return corpus_stats_finalize(
        corpus_stats_partial(df, text_col, group_col, **filter_kwargs),
        group_col=group_col)


def corpus_stats_partial(df: DataFrame, text_col: str = "text",
                         group_col: str = "lang",
                         **filter_kwargs) -> DataFrame:
    """Mergeable intermediate of :func:`corpus_stats`: per-group integer
    sums only (n_docs, total_tokens, n_kept). Because every aggregate is
    a sum/count, partials from disjoint batches MERGE EXACTLY — the
    algebraic property that makes dataset-card stats maintainable
    incrementally (new crawl arrives -> aggregate the batch, merge, done;
    never re-scan the corpus)."""
    feats = quality_filter(df, text_col, **filter_kwargs)
    return feats.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
    )


def corpus_stats_merge(*partials: DataFrame,
                       group_col: str = "lang") -> DataFrame:
    """Merge partial stats (from corpus_stats_partial, possibly read back
    from a stats sink) into one partial — a grouped integer sum.
    *group_col* is explicit: inferring it positionally would silently
    group by the wrong column if a sink reordered columns (review r2)."""
    acc = partials[0]
    for p in partials[1:]:
        acc = acc.unionByName(p)
    return acc.groupBy(group_col).agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("total_tokens").alias("total_tokens"),
        F.sum("n_kept").alias("n_kept"),
    )


def corpus_stats_finalize(partial: DataFrame,
                          group_col: str = "lang") -> DataFrame:
    """Partial -> the presentation columns of :func:`corpus_stats`
    (ratios derived from the integer sums). *group_col* explicit — see
    corpus_stats_merge."""
    return partial.select(
        group_col, "n_docs", "total_tokens", "n_kept",
        F.round(F.col("n_kept") / F.col("n_docs"), 6).alias("keep_rate"),
        F.round(F.col("total_tokens") / F.col("n_docs"), 6)
        .alias("mean_tokens"),
    )


def corpus_length_quantiles(df: DataFrame, text_col: str = "text",
                            group_col: str = "lang",
                            qs: tuple[float, ...] = (0.5, 0.9, 0.99)
                            ) -> DataFrame:
    """Per-group token-length quantiles (dataset-card distribution row).

    Uses the EXACT percentile aggregate so the DuckDB twin
    (quantile_cont — same linear interpolation, verified bit-equal) can
    check it; at 100 TB switch to ``approx_percentile`` (t-digest,
    bounded memory) — exact percentile buffers each group's values."""
    counted = df.select(
        F.col(group_col), token_count(F.col(text_col)).alias("n_tokens"))
    aggs = [
        F.round(F.expr(f"percentile(n_tokens, {q})"), 6)
        .alias(f"p{int(q * 100)}_tokens")
        for q in qs
    ]
    return counted.groupBy(group_col).agg(*aggs)


def top_k_per_group(df: DataFrame, k: int, group_col: str,
                    order_col: str, tiebreak_col: str,
                    descending: bool = True) -> DataFrame:
    """Deterministic per-group top-k (SFT selection: 'best k docs per
    language/source by quality score'). A rank window PARTITIONED BY the
    group — parallelism scales with group cardinality, no global sort;
    ties broken on *tiebreak_col* so the result is unique."""
    from pyspark.sql import Window

    order = [F.desc(order_col) if descending else F.asc(order_col),
             F.asc(tiebreak_col)]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def char_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Shannon entropy of the character distribution (nats)
    — the gibberish/boilerplate signal the token-level heuristics miss
    (base64 blobs read as high entropy, repeated boilerplate as low).

    Map-only like repetition_metrics: one fold over the SORTED character
    array accumulates run lengths (equal chars are adjacent), so no
    explode → groupBy(doc, char) shuffle of the corpus. Each completed
    run contributes ``run * round(ln(run)*1e6)`` INTEGER micro-nats, so
    the per-doc accumulation is exact and engine-portable;
    H = ln(n) - Σ cᵢ·ln(cᵢ) / n is finalized from the integer sum.
    Adds ``n_chars_e`` and ``char_entropy`` (NULL for empty/NULL text).
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    chars = F.split(c, "")
    n = F.when(F.length(c) > 0, F.size(chars)).otherwise(F.lit(0))

    def qln(r):
        return F.round(F.log(r.cast("double")) * 1e6).cast("long")

    zero = F.lit(0).cast("long")
    state = F.aggregate(
        F.array_sort(chars),
        F.struct(F.lit("").alias("prev"), zero.alias("run"),
                 zero.alias("qsum")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            .cast("long").alias("run"),
            (acc["qsum"]
             + F.when((x != acc["prev"]) & (acc["run"] > 0),
                      acc["run"] * qln(acc["run"])).otherwise(zero))
            .alias("qsum")),
        lambda acc: acc["qsum"] + F.when(
            acc["run"] > 0, acc["run"] * qln(acc["run"])).otherwise(zero),
    )
    return df.withColumns({
        "n_chars_e": n.cast("long"),
        "char_entropy": F.when(
            n > 0,
            F.round(F.log(n.cast("double"))
                    - state / n / 1e6, 6)),
    })


def gopher_repetition(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Gopher-suite repetition signals beyond :func:`repetition_metrics`
    (Rae et al. 2021 Table A1): top-2-gram multiplicity fraction,
    duplicate-LINE fraction, and the fraction of characters inside
    duplicated lines (every copy counts, including the first).

    Lines are raw ``\\n`` splits with whitespace-only lines dropped;
    2-grams run over the normalized token stream. All three are per-row
    sorted-array folds (equal elements are adjacent after array_sort) —
    map-only, no explode shuffle, lambdas reference only their arguments
    (the alias-capture pushdown hazard)."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    staged = df.select(
        F.col(id_col),
        F.filter(F.split(c, "\n"), lambda x: F.trim(x) != "").alias("_lines"),
        F.split(normalize_text(c), " ").alias("_toks"),
    )
    lines = F.col("_lines")
    toks = F.col("_toks")
    zero = F.lit(0).cast("long")

    n_lines = F.size(lines)
    total_chars = F.aggregate(
        lines, zero, lambda acc, x: acc + F.length(x))
    sorted_l = F.array_sort(lines)
    # one fold yields BOTH the distinct count (run starts) and the chars
    # inside duplicated lines: on a repeat, add len(x) plus retroactively
    # the first copy's length when the run was still 1
    st = F.aggregate(
        sorted_l,
        F.struct(F.lit(None).cast("string").alias("prev"),
                 zero.alias("run"), zero.alias("dupchars"),
                 zero.alias("distinct")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1)).cast("long").alias("run"),
            (acc["dupchars"] + F.when(
                x == acc["prev"],
                F.length(x) + F.when(acc["run"] == 1, F.length(x))
                .otherwise(zero)).otherwise(zero)).cast("long")
            .alias("dupchars"),
            (acc["distinct"] + F.when(
                x == acc["prev"], zero).otherwise(F.lit(1)).cast("long"))
            .cast("long").alias("distinct")),
    )

    n_pairs = F.greatest(F.size(toks) - 1, F.lit(0))
    grams2 = F.zip_with(
        F.slice(toks, 1, n_pairs), F.slice(toks, 2, n_pairs),
        lambda a, b: F.concat(a, F.lit(" "), b))
    n_2g = F.size(grams2)
    top2 = F.aggregate(
        F.array_sort(grams2),
        F.struct(F.lit(None).cast("string").alias("prev"),
                 zero.alias("run"), zero.alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            .cast("long").alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
                .cast("long")).alias("best")),
    )["best"]

    return staged.select(
        id_col,
        F.round(F.when(n_2g > 0, top2 / n_2g).otherwise(F.lit(0.0)), 6)
        .alias("top_2gram_frac"),
        F.round(F.when(n_lines > 0,
                       1.0 - st["distinct"] / n_lines).otherwise(F.lit(0.0)),
                6).alias("dup_line_frac"),
        F.round(F.when(total_chars > 0,
                       st["dupchars"] / total_chars).otherwise(F.lit(0.0)),
                6).alias("dup_line_char_frac"),
    )


def corpus_rollup(df: DataFrame, dims: tuple[str, str] = ("source", "lang"),
                  text_col: str = "text") -> DataFrame:
    """Multi-level dataset-card stats via ROLLUP: totals per
    (dim1, dim2), per dim1 subtotal, and the grand total in ONE grouped
    aggregation — the hierarchy a dataset release note tables out.

    Spark's ``rollup`` compiles to a single Expand + hash aggregation:
    every input row expands to its 3 grouping-set rows map-side and the
    partial aggregation combines before the shuffle, so the added cost
    over a flat groupBy is the expand factor, never an extra pass or
    join. NULL marks the rolled-up level (standard SQL semantics), and
    all aggregates are integer sums — layout-invariant."""
    d1, d2 = dims
    return (
        df.rollup(d1, d2).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col(text_col)).cast("long"))
            .alias("total_tokens"))
    )
