"""Incremental KG maintenance (kg/delta.py): the incremental path from a
previous snapshot must be SET-IDENTICAL to a full recompute on the new
snapshot, while only touching changed content."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_tabular_spark.kg import delta, extract, link, synth
from rdf_tabular_spark.kg.assemble import build_graph

N_FILES = 120


def _v1(spark):
    return synth.synth_source_table(spark, N_FILES)


def _v2(spark):
    """v1 with: 10 files' content changed (extra import appended), file
    indices 100..119 removed, 6 new files added. The synth table has no
    id column, so the file index comes back out of the path."""
    # try_cast: the expression must stay total — the optimizer can push a
    # projection containing it through the union into the added-files
    # branch, whose paths don't match (ANSI cast of '' then throws)
    idx = F.expr(
        r"try_cast(regexp_extract(path, 'file_(\\d+)\\.', 1) as bigint)")
    base = synth.synth_source_table(spark, N_FILES).filter(idx < 100)
    changed = base.withColumn(
        "content",
        F.when(
            idx % 10 == 0,
            F.concat(F.col("content"), F.lit("\nimport extradep_v2\n")),
        ).otherwise(F.col("content")))
    added_rows = [
        ("repo-added", f"src/new_{j}.py", "c0ffee", "python",
         f"import added_mod_{j % 2}\n\ndef fresh_{j}(x):\n    return x\n")
        for j in range(6)
    ]
    added = changed.sparkSession.createDataFrame(
        added_rows,
        "repo string, path string, commit string, lang string, "
        "content string")
    return changed.unionByName(added)


def _full_graph(src):
    structs = extract.extract_structures(
        src, layout="source", carry_sha=False, emit_file_rows=True)
    mentions = structs.filter(F.col("kind").isin("import", "dep")).select(
        F.col("name").alias("mention"))
    labels = link.link_mentions(mentions)
    file_rows = structs.filter(F.col("kind") == extract.FILE_ROW_KIND)
    return build_graph(None, structs, labels, file_rows=file_rows)


def test_source_diff(spark):
    d = {(r["repo"], r["path"]): r["status"]
         for r in delta.source_diff(_v1(spark), _v2(spark)).collect()}
    statuses = {}
    for s in d.values():
        statuses[s] = statuses.get(s, 0) + 1
    assert statuses == {"changed": 10, "removed": 20, "added": 6}


def test_incremental_equals_full_recompute(spark):
    v1, v2 = _v1(spark), _v2(spark)
    prev_structs = extract.extract_structures(
        v1, layout="source", carry_sha=False, emit_file_rows=True)
    _, _, inc_triples = delta.incremental_graph(prev_structs, v2)
    full_triples = _full_graph(v2)
    assert inc_triples.exceptAll(full_triples).isEmpty()
    assert full_triples.exceptAll(inc_triples).isEmpty()


def test_noop_delta_is_empty_and_stable(spark):
    v1 = _v1(spark)
    assert delta.source_diff(v1, _v1(spark)).isEmpty()
    prev_structs = extract.extract_structures(
        v1, layout="source", carry_sha=False, emit_file_rows=True)
    _, _, inc_triples = delta.incremental_graph(prev_structs, _v1(spark))
    assert inc_triples.exceptAll(_full_graph(v1)).isEmpty()
