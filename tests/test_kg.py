"""Tests for the source-code KG construction pipeline (north rule)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def results(spark, tmp_path_factory):
    from rdf_tabular_spark.kg.pipeline import KGConfig, KGPipeline

    cfg = KGConfig(
        checkpoint_dir=str(tmp_path_factory.mktemp("kgchk")),
        n_files=400, n_repos=12, range_partitions=4)
    pipe = KGPipeline(spark, cfg)
    res = pipe.run()
    res["_pipe"] = pipe
    return res


def test_synth_is_deterministic(spark):
    from rdf_tabular_spark.kg.synth import synth_source_table

    a = synth_source_table(spark, 50, 5, partitions=2).orderBy("repo", "path").collect()
    b = synth_source_table(spark, 50, 5, partitions=4).orderBy("repo", "path").collect()
    assert a == b  # identical content at any parallelism


def test_extraction_finds_structures(results):
    kinds = {r.kind for r in results["extracted"].select("kind").distinct().collect()}
    assert {"import", "def"} <= kinds
    assert "dep" in kinds  # json manifests
    # per-file numbering is dense from 0
    first = results["extracted"].groupBy("repo", "path").agg(
        F.min("row_idx").alias("mn")).agg(F.max("mn")).first()[0]
    assert first == 0


def test_triples_emitted(results):
    t = results["triples"]
    n = t.count()
    assert n > 1000
    preds = {r.pred for r in t.select("pred").distinct().collect()}
    assert any(p.endswith("#imports") for p in preds)
    assert any(p.endswith("#defines") for p in preds)
    assert any(p.endswith("#sha256") for p in preds)
    # graph set semantics: dedup is idempotent
    assert t.distinct().count() == n


def test_content_sha_invariant(results):
    assert results["_pipe"].verify_invariant(results)


def test_entities_and_linking(results):
    ents = results["entities"]
    assert ents.count() > 0
    assert set(ents.columns) == {"iri", "kind", "canonical_key", "aliases"}
    labels = results["labels"]
    # every mention got a canonical label
    assert labels.filter(F.col("canonical").isNull()).count() == 0


def test_resume_skips_completed_stages(spark, results, tmp_path_factory):
    from rdf_tabular_spark.kg.pipeline import KGConfig, KGPipeline

    cfg = KGConfig(
        checkpoint_dir=results["_pipe"].config.checkpoint_dir,
        n_files=400, n_repos=12, range_partitions=4)
    pipe2 = KGPipeline(spark, cfg)
    res2 = pipe2.run()
    # same config hash -> stages resumed, outputs identical
    assert res2["triples"].count() == results["triples"].count()
    assert all(d["resumed"] or d["wall_s"] < 5.0 for d in pipe2.lineage)


def test_adaptive_linking_parity(spark):
    """Driver-local linking (sub-SMALL_VOCAB fast path) groups the same
    aliases as the distributed LSH + CC path on a vocabulary with real
    near-duplicates, and link_mentions picks the local path for it."""
    from rdf_tabular_spark.kg import link

    names = [
        "requests", "Requests", "requests.adapters",
        "lodash", "lo-dash", "lo_dash",
        "numpy", "numpyy",
        "left-pad", "left_pad", "./left-pad",
        "completely.unrelated.module",
    ]
    mentions = spark.createDataFrame([(n,) for n in names], "mention string")

    local_rows = dict(link.link_mentions_local(sorted(names), 0.55))
    dist = {
        r["mention"]: r["canonical"]
        for r in link.connected_components(
            mentions, link.candidate_pairs(mentions, 0.55)).collect()
    }

    def groups(lab):
        g = {}
        for m, c in lab.items():
            g.setdefault(c, set()).add(m)
        return sorted(tuple(sorted(v)) for v in g.values())

    # same grouping; identical canonical choice (min of each group) follows
    assert groups(local_rows) == groups(dist)
    # exact-normalization aliases must merge on both paths
    assert local_rows["lo-dash"] == local_rows["lo_dash"]
    assert local_rows["left-pad"] == local_rows["./left-pad"]
    assert (local_rows["completely.unrelated.module"]
            == "completely.unrelated.module")

    via_adaptive = {
        r["mention"]: r["canonical"]
        for r in link.link_mentions(mentions, 0.55).collect()
    }
    assert groups(via_adaptive) == groups(local_rows)


def test_local_linking_deterministic():
    from rdf_tabular_spark.kg.link import link_mentions_local

    names = sorted(f"pkg{i // 3}.mod{i}" for i in range(60))
    assert link_mentions_local(names) == link_mentions_local(list(names))


def test_per_partition_lineage(spark, results):
    """North rule: per-partition lineage — partition row counts recorded
    for every stage and summing to the stage total."""
    import os

    pipe = results["_pipe"]
    for d in pipe.lineage:
        assert d["n_partitions"] >= 1
        assert sum(d["partition_rows"].values()) == d["rows"]
    ppath = os.path.join(pipe.config.checkpoint_dir,
                         f"partitions-{pipe.config.config_hash}")
    pdf = spark.read.parquet(ppath)
    per_stage = {r["stage"]: r["total"] for r in pdf.groupBy("stage").agg(
        F.sum("rows").alias("total")).collect()}
    got = {d["stage"]: d["rows"] for d in pipe.lineage}
    assert per_stage == got


def test_kg_oracle_linker_equals_norm_grouping():
    """The driver-contract KG oracle (sql_kg_triples/sql_kg_entities)
    replicates entity linking as normalized-equality grouping with
    canonical = min(mention). Assert the REAL linker produces exactly that
    on the staged oracle vocabulary — including at least one non-trivial
    merge (the case-variant spellings), so linking is observable."""
    import re

    import pyarrow.parquet as pq

    from __spark_entry__ import _kg_oracle_source_path
    from rdf_tabular_spark.kg.extract import LANG_RULES
    from rdf_tabular_spark.kg.link import _norm_py, link_mentions_local

    tbl = pq.read_table(_kg_oracle_source_path()).to_pydict()
    vocab: set[str] = set()
    for lang, content in zip(tbl["lang"], tbl["content"]):
        for kind, rx, fl in LANG_RULES[lang]:
            if kind in ("import", "dep"):
                for m in re.finditer(rx, content, fl):
                    vocab.add(m.group("name"))
    linked = dict(link_mentions_local(sorted(vocab), 0.55))
    groups: dict[str, list[str]] = {}
    for m in vocab:
        groups.setdefault(_norm_py(m), []).append(m)
    expect = {m: min(g) for g in groups.values() for m in g}
    assert linked == expect
    assert any(m != c for m, c in linked.items())


def test_resume_after_partial_stage_failure(spark, tmp_path):
    """Kill-and-resume: a crash mid-write leaves a stage directory WITHOUT
    its _SUCCESS marker. The re-run must redo that stage (and only it —
    completed stages resume from checkpoint) and produce a byte-identical
    graph."""
    import os
    import shutil

    from rdf_tabular_spark.kg.pipeline import KGConfig, KGPipeline

    cfg = KGConfig(checkpoint_dir=str(tmp_path / "chk"),
                   n_files=200, n_repos=8, range_partitions=2)
    clean = KGPipeline(spark, cfg).run()
    want = sorted(map(tuple, clean["triples"].collect()))

    # simulate the crash: the 'graph' stage died mid-write (partial files,
    # no _SUCCESS), everything before it completed
    graph_dir = [
        os.path.join(cfg.checkpoint_dir, d)
        for d in os.listdir(cfg.checkpoint_dir) if d.startswith("graph-")
    ][0]
    shutil.rmtree(graph_dir)
    os.makedirs(graph_dir)
    with open(os.path.join(graph_dir, "part-00000-garbage.parquet"), "w") as f:
        f.write("truncated mid-write")

    pipe2 = KGPipeline(spark, cfg)
    res2 = pipe2.run()
    resumed = {d["stage"]: d["resumed"] for d in pipe2.lineage}
    assert resumed["source"] and resumed["extract"] and resumed["labels"]
    assert not resumed["graph"]  # the killed stage re-ran
    got = sorted(map(tuple, res2["triples"].collect()))
    assert got == want


def test_materialize_graph_partition_pruning(spark, tmp_path):
    """Final graph tables: triple table partitioned by pred (a constant-
    predicate read carries a PartitionFilter — the BGP layer's scan
    shape), full roundtrip, and deterministic JSON-lines serialization."""
    import json

    from pyspark.sql import functions as F

    from rdf_tabular_spark.kg.materialize import (
        graph_json_lines,
        materialize_graph,
        read_triples,
    )

    tr = spark.createDataFrame(
        [("a", "imports", "x"), ("a", "imports", "b"),
         ("a", "defines", 'f"1'), ("b", "imports", "x")],
        "subj string, pred string, obj string")
    ent = spark.createDataFrame([("x", "module")], "iri string, kind string")

    paths = materialize_graph(tr, ent, str(tmp_path))
    back = read_triples(spark, str(tmp_path))
    assert back.count() == 4

    pruned = back.filter(F.col("pred") == "imports")
    plan = pruned._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "pred" in pf[0]
    assert pruned.count() == 3

    lines = {r["subj"]: json.loads(r["json"])
             for r in graph_json_lines(tr).collect()}
    assert lines["a"] == {"@id": "a", "defines": ['f"1'],
                          "imports": ["b", "x"]}
    assert lines["b"] == {"@id": "b", "imports": ["x"]}


def test_shingle_blocked_pairs_shared_and_cap(spark):
    from rdf_tabular_spark.kg.link import shingle_blocked_pairs

    m = spark.createDataFrame(
        [("numpy",), ("numpi",), ("flask",)], "mention string")
    got = {(r.a, r.b): r.shared
           for r in shingle_blocked_pairs(m, min_shared=2).collect()}
    # numpy/numpi share ^nu, num, ump (not the tails); flask pairs with
    # nobody at min_shared=2
    assert ("numpi", "numpy") in got and got[("numpi", "numpy")] >= 2
    assert all("flask" not in pair for pair in got)
    # a df cap of 1 makes every shingle a stop-shingle: no candidates
    assert shingle_blocked_pairs(m, min_shared=1, max_df=1).count() == 0


def test_tfidf_rescore_hand_computed(spark):
    import math

    from rdf_tabular_spark.kg.link import (
        _shingles_py, tfidf_rescore)

    names = ["numpy", "numpi", "flask"]
    m = spark.createDataFrame([(n,) for n in names], "mention string")
    pairs = spark.createDataFrame(
        [("numpi", "numpy"), ("flask", "numpy")], "a string, b string")
    got = {(r.a, r.b): r.tfidf_micro for r in
           tfidf_rescore(m, pairs).collect()}

    sh = {n: _shingles_py(n) for n in names}
    df = {}
    for s in sh.values():
        for t in s:
            df[t] = df.get(t, 0) + 1
    idf = {t: round(math.log(4 / (c + 1)) * 1e6) for t, c in df.items()}
    for a, b in [("numpi", "numpy"), ("flask", "numpy")]:
        num = sum(idf[t] for t in sh[a] & sh[b])
        den = sum(idf[t] for t in sh[a] | sh[b])
        assert got[(a, b)] == (2 * 1000000 * num + den) // (2 * den)
    # the near-duplicate outranks the unrelated pair
    assert got[("numpi", "numpy")] > got[("flask", "numpy")]


def test_tfidf_rescore_partition_invariance(spark):
    from rdf_tabular_spark.kg.link import shingle_blocked_pairs, tfidf_rescore

    m = spark.createDataFrame(
        [(w,) for w in ["requests", "request", "reqwests", "numpy",
                        "pandas", "pandass"]], "mention string")
    p = shingle_blocked_pairs(m, min_shared=2)
    a = sorted(map(tuple, tfidf_rescore(m, p).collect()))
    b = sorted(map(tuple, tfidf_rescore(m.repartition(5),
                                        p.repartition(3)).collect()))
    assert a == b
