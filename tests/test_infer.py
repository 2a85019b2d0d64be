"""RDFS forward-chaining materialization (kg/infer.py).

Rule-by-rule checks on a hand-built graph, closure idempotence, and the
broadcast-TBox plan shape. Rule numbering follows the RDFS entailment
tables of the RDF 1.1 Semantics REC (rdfs2/3/5/7/9/11)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_tabular_spark.kg import infer
from rdf_tabular_spark.kg.annotate import KG
from rdf_tabular_spark.csvw.datatypes import RDF_TYPE


def _triples(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, iri, None, None) for s, p, o, iri in rows],
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, obj_lang string")


@pytest.fixture(scope="module")
def onto(spark):
    return infer.ontology_df(spark)


def test_tbox_closure_transitive(spark):
    onto = infer.ontology_df(spark, [
        ("A", infer.SUBCLASS, "B"),
        ("B", infer.SUBCLASS, "C"),
        ("C", infer.SUBCLASS, "D"),
        ("p", infer.SUBPROP, "q"),
        ("q", infer.SUBPROP, "r"),
        ("p", infer.DOMAIN, "A"),
    ])
    got = {(r.subj, r.pred, r.obj) for r in infer.tbox_closure(onto).collect()}
    assert ("A", infer.SUBCLASS, "C") in got
    assert ("A", infer.SUBCLASS, "D") in got  # depth 3
    assert ("B", infer.SUBCLASS, "D") in got
    assert ("p", infer.SUBPROP, "r") in got
    assert ("p", infer.DOMAIN, "A") in got  # carried through
    # nothing invented
    assert ("D", infer.SUBCLASS, "A") not in got
    assert len(got) == 6 + 4


def test_rdfs7_subproperty_edge(spark, onto):
    t = _triples(spark, [("f1", KG + "imports", "m1", True)])
    got = {(r.subj, r.pred, r.obj)
           for r in infer.rdfs_materialize(t, onto, include_tbox=False).collect()}
    assert ("f1", KG + "references", "m1") in got
    # transitive superproperty in ONE pass (closed TBox)
    assert ("f1", KG + "associatedWith", "m1") in got


def test_rdfs2_3_domain_range_types(spark, onto):
    t = _triples(spark, [("f1", KG + "defines", "s1", True),
                         ("f2", KG + "imports", "m1", True)])
    got = {(r.subj, r.pred, r.obj)
           for r in infer.rdfs_materialize(t, onto, include_tbox=False).collect()}
    assert ("f1", RDF_TYPE, KG + "Definer") in got          # rdfs2
    assert ("m1", RDF_TYPE, KG + "Importable") in got       # rdfs3
    # rdfs9 over the rdfs2/3-derived types, same pass
    assert ("f1", RDF_TYPE, KG + "CodeEntity") in got
    assert ("m1", RDF_TYPE, KG + "CodeEntity") in got


def test_rdfs3_skips_literal_objects(spark, onto):
    onto2 = infer.ontology_df(spark, [(KG + "path", infer.RANGE, "X")])
    t = _triples(spark, [("f1", KG + "path", "a/b.py", False)])
    got = {(r.subj, r.pred, r.obj)
           for r in infer.rdfs_materialize(t, onto2, include_tbox=False).collect()}
    assert ("a/b.py", RDF_TYPE, "X") not in got


def test_rdfs9_asserted_types(spark, onto):
    t = _triples(spark, [("s1", RDF_TYPE, KG + "Class", True)])
    got = {(r.subj, r.pred, r.obj)
           for r in infer.rdfs_materialize(t, onto, include_tbox=False).collect()}
    assert ("s1", RDF_TYPE, KG + "Symbol") in got
    assert ("s1", RDF_TYPE, KG + "CodeEntity") in got  # depth 2


def test_materialize_idempotent_and_set(spark, onto):
    # contract: asserted input is a SET (kg/assemble.py set-dedups it) —
    # materialize then never shuffles the asserted stream, and output is
    # a set again, so materialize is idempotent
    t = _triples(spark, [
        ("f1", KG + "imports", "m1", True),
        ("f1", RDF_TYPE, KG + "File", True),
    ])
    once = infer.rdfs_materialize(t, onto)
    twice = infer.rdfs_materialize(once, onto)
    rows1 = [tuple(r) for r in once.collect()]
    rows2 = [tuple(r) for r in twice.collect()]
    assert len(rows1) == len(set(rows1))  # set semantics out
    assert set(rows1) == set(rows2) and len(rows2) == len(rows1)


def test_rdfs7_preserves_literal_object_metadata(spark):
    # a literal-valued subproperty edge must keep its literal shape when
    # propagated to the superproperty — not be relabeled an IRI
    onto2 = infer.ontology_df(
        spark, [(KG + "path", infer.SUBPROP, KG + "label")])
    t = spark.createDataFrame(
        [("f1", KG + "path", "a/b.py", False, "xs:string", None)],
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, obj_lang string")
    rows = {(r.subj, r.pred, r.obj): (r.obj_is_iri, r.obj_datatype,
                                      r.obj_lang)
            for r in infer.rdfs_materialize(
                t, onto2, include_tbox=False).collect()}
    assert rows[("f1", KG + "label", "a/b.py")] == (False, "xs:string", None)
    assert rows[("f1", KG + "path", "a/b.py")] == (False, "xs:string", None)


def test_asserted_row_wins_on_collision(spark):
    # an inferred (s,p,o) that collides with an asserted row must not
    # clobber the asserted metadata (anti-join priority, not a
    # nondeterministic dropDuplicates winner)
    onto2 = infer.ontology_df(
        spark, [(KG + "path", infer.SUBPROP, KG + "label")])
    t = spark.createDataFrame(
        [("f1", KG + "path", "a/b.py", False, "xs:string", None),
         # asserted row at the derived coordinate, different metadata
         ("f1", KG + "label", "a/b.py", False, None, "en")],
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, obj_lang string")
    out = infer.rdfs_materialize(t, onto2, include_tbox=False).collect()
    hits = [r for r in out
            if (r.subj, r.pred, r.obj) == ("f1", KG + "label", "a/b.py")]
    assert len(hits) == 1
    assert (hits[0].obj_is_iri, hits[0].obj_datatype,
            hits[0].obj_lang) == (False, None, "en")


def test_asserted_stream_has_no_exchange(spark, onto, tmp_path):
    # VERDICT r3 item 3: the full-width asserted graph must flow to the
    # output union with NO Exchange — only its narrow (s,p,o) projection
    # participates in the anti-join, and only the inferred side is
    # aggregated. Walk the pre-adaptive physical plan: the Union child
    # that contains the full-width scan must be Exchange-free.
    t = _triples(spark, [("f1", KG + "imports", "m1", True),
                         ("s1", RDF_TYPE, KG + "Class", True)])
    path = str(tmp_path / "asserted")
    t.write.parquet(path)
    asserted = spark.read.parquet(path)
    out = infer.rdfs_materialize(asserted, onto)
    plan = out._jdf.queryExecution().sparkPlan()

    def walk(node):
        yield node
        for i in range(node.children().size()):
            yield from walk(node.children().apply(i))

    union = next(n for n in walk(plan) if n.nodeName() == "Union")
    branches = [union.children().apply(i)
                for i in range(union.children().size())]
    full_width = [
        b for b in branches
        if any("FileScan" in n.nodeName() or "Scan parquet" in n.nodeName()
               or "ColumnarToRow" in n.nodeName() for n in walk(b))
        and "obj_datatype" in b.output().toString()]
    assert full_width, "asserted scan branch not found under Union"
    for b in full_width:
        names = [n.nodeName() for n in walk(b)]
        assert not any("Exchange" in nm for nm in names), names
    # and the anti-join probe side is column-pruned to (subj, pred, obj)
    text = out._jdf.queryExecution().toString()
    assert "struct<subj:string,pred:string,obj:string>" in text, text[-2000:]


def test_inferred_only_excludes_asserted(spark, onto):
    t = _triples(spark, [
        ("f1", KG + "imports", "m1", True),
        ("f1", RDF_TYPE, KG + "File", True),
    ])
    new = infer.inferred_only(t, onto)
    joined = new.join(
        t.select("subj", "pred", "obj"), ["subj", "pred", "obj"], "inner")
    assert joined.isEmpty()
    got = {(r.subj, r.pred, r.obj) for r in new.collect()}
    assert ("f1", RDF_TYPE, KG + "Artifact") in got


def test_instance_side_broadcast_plan(spark, onto):
    t = _triples(spark, [("f1", KG + "imports", "m1", True)])
    plan = infer.rdfs_materialize(t, onto)._jdf.queryExecution().executedPlan().toString()
    # every TBox RULE join must broadcast the ontology side; the only
    # join allowed to sort-merge is the final inferred-vs-asserted
    # LeftAnti dedup (narrow (s,p,o) keys; AQE broadcast-converts it when
    # the asserted side is small)
    assert "BroadcastHashJoin" in plan
    smj_lines = [ln for ln in plan.splitlines() if "SortMergeJoin" in ln]
    assert all("LeftAnti" in ln for ln in smj_lines), smj_lines


def test_incremental_equals_full_recompute(spark, onto):
    old = _triples(spark, [
        ("f1", KG + "imports", "m1", True),
        ("f1", RDF_TYPE, KG + "File", True),
        ("s1", RDF_TYPE, KG + "Class", True),
    ])
    delta = _triples(spark, [
        ("f2", KG + "defines", "s2", True),
        ("f1", KG + "imports", "m1", True),  # overlap with old
    ])
    base = infer.rdfs_materialize(old, onto)
    inc = infer.rdfs_incremental(base, delta, onto)
    full = infer.rdfs_materialize(old.unionByName(delta), onto)
    got = {tuple(r) for r in inc.collect()}
    want = {tuple(r) for r in full.collect()}
    assert got == want
    assert inc.count() == len(got)  # still a set
