"""Stage 4/5: canonical graph assembly — set semantics WITHOUT a
triple-level dedup shuffle.

Every stream entering the final union is already a set:

- file-level + repo triples: unique by construction (one bundle per file /
  distinct repos);
- import/dep edges: mention names canonicalized on the NARROW extracted
  rows (broadcast alias join, ~80-byte rows), then deduped per
  (repo, path, kind, name);
- (file defines sym) edges: deduped per (repo, path, name);
- module metadata: from the label map (canonical vocabulary);
- symbol metadata: from distinct (repo, name[, kind/row_idx]) sets.

Verified set-identical to the per-occurrence + global-dedup formulation at
1M files (15,007,451 triples, exceptAll = 0 both directions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import TRIPLE_COLUMNS
from . import annotate, link


def build_graph(src: DataFrame, extracted: DataFrame,
                labels: DataFrame,
                file_rows: DataFrame | None = None) -> DataFrame:
    """(source, extracted structures, mention labels) -> final triple set.

    With *file_rows* (the extraction UDF's per-file rows,
    ``extract_structures(emit_file_rows=True)``) the per-file bundle and
    repo types derive from the extraction output and *src* is never
    re-scanned — one content scan for the whole job."""
    canon = link.canonicalize_mentions(extracted, labels)
    defs = extracted.filter(F.col("kind").isin("def", "class"))
    # one dedup shuffle for all edges, on ONLY the columns edge emission
    # reads — dropDuplicates shuffles whole rows, so projecting first
    # roughly halves the shuffled bytes; def/class collapse to one key
    # value because both emit the same (file defines sym) edge
    edge_cols = ["repo", "path", "kind", "name"]
    edge_stream = canon.select(*edge_cols).unionByName(
        defs.select(*edge_cols)).withColumn(
        "_ekey",
        F.when(F.col("kind").isin("def", "class"), F.lit("defsym"))
        .otherwise(F.col("kind")))
    edges = edge_stream.dropDuplicates(
        ["repo", "path", "_ekey", "name"]).drop("_ekey")
    if file_rows is not None:
        file_stream = annotate.file_level_triples_from_rows(file_rows)
        repo_stream = annotate.repo_triples(file_rows)
    else:
        file_stream = annotate.file_level_triples(src)
        repo_stream = annotate.repo_triples(src)
    return (
        annotate.edge_triples(edges)
        .unionByName(link.module_metadata_from_labels(labels, canon))
        .unionByName(annotate.symbol_metadata_triples(defs))
        .unionByName(file_stream)
        .unionByName(repo_stream)
        .select(*TRIPLE_COLUMNS)
    )
