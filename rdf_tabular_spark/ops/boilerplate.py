"""Per-source boilerplate line removal (the CCNet / web-curation shape).

Web pages from one site share chrome — nav bars, cookie banners,
"subscribe" calls, copyright footers — that survives text extraction
and poisons a training corpus with massively-duplicated non-content.
The standard fix (CCNet, Wenzek et al. arXiv:1911.00359; C4's line
filters, Raffel et al. arXiv:1910.10683): a line appearing in more than
a threshold fraction of a SOURCE's documents is boilerplate and is cut
from every document of that source.

Scale shape (100 TB corpus):

- the detection pass explodes lines but immediately reduces them to
  narrow ``(site, line_md5, doc_id)`` rows; the per-line distinct-doc
  count is Spark's two-phase distinct aggregate — the wide phase is
  keyed by (site, hash, doc), so a hot site's mass still spreads across
  reducers;
- per-site doc totals are one tiny aggregation;
- the boilerplate SET is threshold-bounded (a line must appear in
  > threshold of a site's docs, so a site can have at most
  ``lines_per_doc / threshold`` boilerplate lines) — it is collected
  per site and BROADCAST, making the removal pass map-only: split,
  filter against the set, re-join. The corpus is scanned once per pass
  and never shuffled.

Line identity is md5 of the raw line (after the engine-portable
convention of ops/split.py), so the DuckDB twin replays detection and
removal bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boilerplate_lines(docs: DataFrame, threshold: float = 0.5,
                      min_docs: int = 3, site_col: str = "site",
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(site, line_md5, n_docs, site_docs) for every non-empty line
    present in > *threshold* of its site's documents (and at least
    *min_docs* of them — small sites can't declare boilerplate off two
    pages)."""
    lines = (
        docs.select(site_col, id_col,
                    F.explode(F.split(F.col(text_col), "\n")).alias("line"))
        .filter(F.col("line") != ""))
    per_line = lines.groupBy(
        site_col, F.md5("line").alias("line_md5")).agg(
        F.count_distinct(id_col).alias("n_docs"))
    totals = docs.groupBy(site_col).agg(F.count("*").alias("site_docs"))
    return (
        per_line.join(totals, site_col)
        .filter((F.col("n_docs") >= min_docs)
                & (F.col("n_docs") / F.col("site_docs") > threshold))
        .select(site_col, "line_md5", "n_docs", "site_docs"))


def remove_boilerplate(docs: DataFrame, threshold: float = 0.5,
                       min_docs: int = 3, site_col: str = "site",
                       id_col: str = "doc_id", text_col: str = "text",
                       detected: DataFrame | None = None) -> DataFrame:
    """Cut every boilerplate line (per :func:`boilerplate_lines`) out of
    every document of its site. Returns the input rows with *text_col*
    replaced by the cleaned text plus an ``n_removed`` line count; docs
    that were pure chrome come back with empty text, not dropped (the
    caller's quality filter decides their fate).

    Pass *detected* (a :func:`boilerplate_lines` result) to reuse a
    detection pass the caller already ran — otherwise detection (one
    corpus-wide aggregate) reruns here. The per-site hash sets broadcast
    (threshold-bounded, see module docstring), so the removal pass is
    map-only over the corpus.

    Cost note: consuming BOTH outputs evaluates the per-line filter
    twice per row — higher-order trees are excluded from Spark's
    subexpression elimination, so the cleaned text and the count can't
    share one evaluation as column expressions. Consumers that select
    only the cleaned text don't pay for the count (column pruning drops
    that branch); the md5-per-line pass itself is cheap next to the
    scan."""
    if detected is None:
        detected = boilerplate_lines(
            docs, threshold, min_docs, site_col, id_col, text_col)
    sets = detected.groupBy(site_col).agg(
        F.sort_array(F.collect_set("line_md5")).alias("_bp"))
    joined = docs.join(F.broadcast(sets), site_col, "left")
    bp = F.coalesce(F.col("_bp"), F.array().cast("array<string>"))
    split = F.split(F.col(text_col), "\n")
    kept = F.filter(split, lambda l: ~F.array_contains(bp, F.md5(l)))
    out_cols = [c for c in docs.columns if c != text_col]
    return joined.select(
        *out_cols,
        F.array_join(kept, "\n").alias(text_col),
        (F.size(split) - F.size(kept)).cast("long").alias("n_removed"))
