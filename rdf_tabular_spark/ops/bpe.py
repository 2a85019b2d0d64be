"""Distributed BPE tokenizer training and encoding.

The classic byte-pair-encoding trainer (Sennrich et al., public
algorithm) iterates: count adjacent symbol pairs, merge the most
frequent pair everywhere, repeat. The scale-critical observation is that
training operates on the WORD-FREQUENCY TABLE, not the corpus: one
corpus-scale aggregation builds (word, count) — at 100 TB the distinct
vocabulary is ~10^7-10^8 narrow rows, orders of magnitude smaller than
the corpus — and every merge iteration then touches only that table:

    explode adjacent symbol pairs weighted by word count
      -> partial+final hash agg -> global top-1 (a 1-row collect)
      -> map-only fold applying the merge to each word's symbol array

Per iteration: one shuffle over the vocab + one driver row. The corpus
itself is read exactly once. Encoding is map-only: the learned merge
list is a driver-side constant folded into chained array expressions
(native, whole-stage codegen) — no Python in either hot path.

Determinism: ties in pair frequency break on (pair_count DESC, left,
right), so the learned merge table is unique for a given corpus.
No DuckDB oracle twin — each merge step re-segments every word, an
iterative fixpoint ANSI SQL can't express; correctness is pinned by
parity with a pure-Python reference implementation in tests/test_bpe.py
(same evidence class as the reference's golden fixtures).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: end-of-word marker (kept multi-char so it cannot collide with a char)
EOW = "</w>"


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, count) — the ONE corpus-scale pass of training."""
    from .text import nonempty_tokens

    words = docs.select(
        F.explode(nonempty_tokens(F.col(text_col))).alias("word"))
    return words.groupBy("word").agg(F.count("*").alias("count"))


def _initial_symbols(word: Column) -> Column:
    """word -> its character symbols plus the end-of-word marker."""
    chars = F.split(word, "")
    # Spark's split('') leaves no trailing empty element; append EOW
    return F.concat(chars, F.array(F.lit(EOW)))


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right replacement of adjacent (left, right) with the
    concatenated symbol — a single fold, map-only."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left) & (x == right),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(docs: DataFrame, n_merges: int = 10,
              text_col: str = "text",
              min_pair_count: int = 2) -> list[tuple[str, str, int]]:
    """Learn *n_merges* BPE merges; returns [(left, right, pair_count)]
    in merge order. Stops early when no pair reaches *min_pair_count*.

    The vocab is localCheckpoint-ed each iteration: the merge fold is a
    large expression, and chaining k of them nests the plan k deep —
    checkpointing keeps every iteration's plan constant-size (same
    plan-growth discipline as PageRank / connected_components)."""
    vocab = (
        word_vocab(docs, text_col)
        .select("count", _initial_symbols(F.col("word")).alias("syms"))
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            vocab.filter(F.size("syms") > 1)
            .select(
                "count",
                F.explode(F.arrays_zip(
                    F.slice("syms", 1, F.size("syms") - 1).alias("l"),
                    F.expr("slice(syms, 2, size(syms) - 1)").alias("r"),
                )).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("count").alias("pair_count"))
        )
        top = (
            pairs.orderBy(F.desc("pair_count"), "l", "r").limit(1).collect()
        )
        if not top or top[0]["pair_count"] < min_pair_count:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["pair_count"])
        merges.append((left, right, cnt))
        vocab = vocab.select(
            "count", _apply_merge(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint()
    return merges


#: merge-list size above which ``engine="auto"`` switches from chained
#: native folds (plan grows linearly with merge count; blows
#: task-binary/codegen limits near real 32k-merge tokenizers) to the
#: Arrow-batched rank-map UDF
NATIVE_MERGE_LIMIT = 200


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str, int]],
               text_col: str = "text", id_col: str = "doc_id",
               engine: str = "auto") -> DataFrame:
    """Apply a learned merge list to every document: (id_col, n_bpe_tokens,
    tokens array for inspection). Two map-only engines, identical output
    (pinned by parity tests):

    - ``native`` — merges folded into chained native array expressions,
      one fold per merge, whole-stage codegen. The expression tree grows
      linearly with merge count, so this path is bounded at a few
      hundred merges.
    - ``udf`` — the 32k-merge scale path: a broadcast merge-rank map
      applied in an Arrow-batched ``mapInPandas`` (lowest-rank-pair
      loop, the classic tokenizer apply; per-batch word memoization).
      One broadcast + zero shuffles; word splitting stays native
      (the same ``nonempty_tokens`` expression both engines share).

    ``auto`` picks ``udf`` above ``NATIVE_MERGE_LIMIT`` merges.
    The engines are equivalent because applying merge k can never create
    an occurrence of a lower-ranked pair (the merged symbol l+r did not
    exist when earlier merges were learned, and new adjacencies always
    involve it), so sequential in-order folds and the min-rank loop
    reach the same fixpoint."""
    if engine == "auto":
        engine = "udf" if len(merges) > NATIVE_MERGE_LIMIT else "native"
    if engine == "udf":
        return _bpe_encode_udf(docs, merges, text_col, id_col)
    if engine != "native":
        raise ValueError(f"unknown bpe_encode engine: {engine!r}")
    from .text import nonempty_tokens

    # empty tokens are filtered exactly as in word_vocab: without the
    # filter, a NULL/empty doc (or, pre-normalize-fix, edge whitespace)
    # segmented to phantom ['', '</w>'] tokens the trained vocabulary
    # says don't exist (review r2)
    words = nonempty_tokens(F.col(text_col))
    seg = F.transform(words, lambda w: _initial_symbols(w))

    # NB: the transform lambda must take EXACTLY one parameter — Spark
    # binds a second parameter to the element index, so default-arg
    # capture (lambda s, _l=l: ...) silently passes indices as symbols
    def _merge_fn(left: str, right: str):
        return lambda s: _apply_merge(s, left, right)

    for left, right, _ in merges:
        seg = F.transform(seg, _merge_fn(left, right))
    toks = F.flatten(seg)
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_bpe_tokens"),
        toks.alias("bpe_tokens"),
    )


def _segment_word(word: str, ranks: dict, cache: dict) -> list[str]:
    """Segment one word with the min-rank merge loop (same greedy
    left-to-right replacement per pass as :func:`_apply_merge`)."""
    got = cache.get(word)
    if got is not None:
        return got
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best = None
        best_rank = None
        for a, b in zip(syms, syms[1:]):
            rk = ranks.get((a, b))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best = rk, (a, b)
        if best is None:
            break
        left, right = best
        merged = left + right
        out: list[str] = []
        for x in syms:
            if out and out[-1] == left and x == right:
                out[-1] = merged
            else:
                out.append(x)
        syms = out
    cache[word] = syms
    return syms


def _bpe_encode_udf(docs: DataFrame, merges: list[tuple[str, str, int]],
                    text_col: str, id_col: str) -> DataFrame:
    """The scale engine of :func:`bpe_encode`: broadcast merge-rank map +
    Arrow-batched mapInPandas. Word splitting happens natively BEFORE the
    UDF (shared nonempty_tokens expression), so Python only ever sees
    word arrays; a per-task memo cache collapses the Zipfian word
    distribution (most batches re-segment few distinct words)."""
    import pandas as pd

    from ..deploy import ensure_py_files
    from .text import nonempty_tokens

    ensure_py_files(docs.sparkSession)
    ranks = {(left, right): i for i, (left, right, *_) in enumerate(merges)}
    b_ranks = docs.sparkSession.sparkContext.broadcast(ranks)
    id_type = docs.schema[id_col].dataType.simpleString()
    staged = docs.select(
        F.col(id_col).alias("_id"),
        nonempty_tokens(F.col(text_col)).alias("_words"))
    schema = f"{id_col} {id_type}, n_bpe_tokens int, bpe_tokens array<string>"

    def run(batches):
        rk = b_ranks.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks, ns = [], []
            for words in pdf["_words"]:
                out: list[str] = []
                for w in words:
                    out.extend(_segment_word(w, rk, cache))
                toks.append(out)
                ns.append(len(out))
            yield pd.DataFrame(
                {id_col: pdf["_id"], "n_bpe_tokens": ns, "bpe_tokens": toks})

    return staged.mapInPandas(run, schema=schema)
