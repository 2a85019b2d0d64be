"""Sequence packing: assign documents to fixed-token-budget bins for
LLM pre-training batch assembly.

This is streaming *offset packing* (the concatenate-then-chunk scheme
standard in pre-training data loaders), not combinatorial bin-packing:
documents are laid out in a deterministic order within a shard and each
document's bin is the chunk its start offset falls into.  Deterministic,
join-free, and exactly expressible in ANSI SQL (windowed running sum),
which is what makes it oracle-verifiable.

Scale shape: the only non-map operator is a window partitioned by
``shard`` — pick ``n_shards`` at a multiple of cluster parallelism so
each shard's sort fits an executor (a 100 TB corpus at 10k shards is
~10 GB per shard; the per-shard ORDER BY is a local spillable sort, and
there is NO global sort or single-partition window anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def pack_offsets(df: DataFrame, max_tokens: int = 512, n_shards: int = 8,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Per document: (shard, n_tokens, bin id within the shard, token
    offset within the bin).

    Shard = md5-derived bucket of the id (portable across engines and
    independent of the id's type or distribution); layout order within a
    shard is the id itself. A document whose start offset lands at
    ``k*max_tokens <= off < (k+1)*max_tokens`` belongs to bin ``k`` —
    long documents spill over their bin boundary and the loader truncates
    or wraps, exactly as in the streaming chunker this models."""
    from .split import hash_bucket

    shard = hash_bucket(F.col(id_col), salt=None, buckets=n_shards).cast("int")
    staged = df.select(
        F.col(id_col),
        shard.alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_start")
    staged = staged.select(id_col, "shard", "n_tokens", start)
    return staged.select(
        id_col, "shard", "n_tokens",
        (F.col("_start") / max_tokens).cast("long").alias("bin_id"),
        F.pmod(F.col("_start"), F.lit(max_tokens)).cast("long")
        .alias("bin_offset"))


def chunk_documents(df: DataFrame, chunk_tokens: int = 128,
                    overlap: int = 32, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split every document into fixed-token windows with overlap — the
    retrieval/embedding chunker (RAG indexing, long-doc embedding):
    chunk k covers tokens [k*stride, k*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the last window is the remainder
    (never empty, never duplicated).

    Map-only: tokenize once per row, explode a generated chunk-start
    sequence, slice the token array per chunk. No shuffle — at 100 TB
    this runs at scan speed and multiplies rows by ~n_tokens/stride.
    Empty/NULL docs produce no chunks.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    from .text import normalize_text

    staged = df.select(
        F.col(id_col),
        F.split(normalize_text(F.coalesce(F.col(text_col), F.lit(""))),
                " ").alias("_toks"),
    ).filter((F.size("_toks") > 0) & (F.element_at("_toks", 1) != ""))
    n = F.size("_toks")
    # number of chunks = ceil(max(n - overlap, 1) / stride)
    n_chunks = F.ceil(F.greatest(n - overlap, F.lit(1)) / stride).cast("int")
    exploded = staged.select(
        id_col, "_toks", n.alias("_n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"))
    chunk = F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1,
                    F.lit(chunk_tokens))
    return exploded.select(
        id_col,
        "chunk_idx",
        F.least(F.lit(chunk_tokens),
                F.col("_n") - F.col("chunk_idx") * stride).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def assign_shards(df: DataFrame, n_shards: int = 16,
                  id_col: str = "doc_id", text_col: str = "text",
                  sub_bands: int = 16) -> DataFrame:
    """Balanced training-shard assignment: serpentine (boustrophedon)
    striping over the documents in descending-token order — the final
    step of a curation pipeline, where packed documents land in N output
    shards whose token totals must be near-equal so no training-data
    reader becomes the straggler.

    Rank documents by ``(n_tokens DESC, sub_band, id)`` and stripe rank
    ``r`` to shard ``r % n`` on even passes and ``n-1-(r % n)`` on odd
    passes: each full pass hands every shard exactly one document, and
    reversing the direction per pass cancels the within-pass descending
    bias (classic LPT-style balance without LPT's sequential state —
    max-min shard skew stays O(largest document), not O(pass count)).

    Scale shape: a naive global ``row_number`` would be a single-partition
    window. Instead the global rank is composed from value-based cells:
    ``band = n_tokens`` (value, not quantile — deterministic) crossed
    with ``sub_band = md5-bucket(id)`` (spreads the short-doc hot bands,
    where millions of docs share one token count). Ranks are computed
    per cell with an ordinary partitioned window, then offset by the
    running total of cell sizes — a vocabulary-sized table (distinct
    token counts x sub_bands) whose single-partition running sum is
    bounded and cheap. One narrow shuffle of (id, n_tokens, sub) rows,
    one bounded window; the corpus text never moves.
    """
    from .split import hash_bucket
    from .text import token_count

    staged = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        hash_bucket(F.col(id_col), salt="shard_rank",
                    buckets=sub_bands).cast("int").alias("_sub"))
    cells = staged.groupBy("n_tokens", "_sub").agg(
        F.count(F.lit(1)).alias("_cnt"))
    w_off = (Window.orderBy(F.desc("n_tokens"), F.asc("_sub"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = cells.select(
        "n_tokens", "_sub",
        (F.sum("_cnt").over(w_off) - F.col("_cnt")).alias("_off"))
    w_cell = Window.partitionBy("n_tokens", "_sub").orderBy(id_col)
    ranked = (
        staged.join(F.broadcast(offsets), ["n_tokens", "_sub"])
        .select(
            id_col, "n_tokens",
            (F.col("_off") + F.row_number().over(w_cell) - 1)
            .alias("global_rank")))
    r, n = F.col("global_rank"), F.lit(n_shards)
    pos = F.pmod(r, n)
    shard = F.when(F.pmod(F.floor(r / n), F.lit(2)) == 0, pos) \
        .otherwise(n - 1 - pos)
    return ranked.select(
        id_col, "n_tokens", "global_rank",
        shard.cast("int").alias("shard"))


def shard_stats(assigned: DataFrame) -> DataFrame:
    """Per-shard document and token totals of an :func:`assign_shards`
    result — the balance report a pipeline asserts on before writing.
    One map-side-combined aggregation on the narrow assignment table."""
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"))
