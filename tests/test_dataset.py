"""SPARQL dataset semantics (kg/dataset.py): named graphs, default
graph, GRAPH-scoped quad patterns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_tabular_spark.kg.dataset import (
    default_graph,
    match_quads,
    named_graphs,
    union_graph,
    with_graph,
)

# (graph, subj, pred, obj); None = default graph
Q = [
    ("g:1", "f:a", "imports", "m:x"),
    ("g:1", "f:a", "inRepo", "r:1"),
    ("g:1", "f:c", "imports", "m:y"),
    ("g:2", "f:b", "imports", "m:x"),
    ("g:2", "f:b", "inRepo", "r:2"),
    (None, "m:x", "version", "1.2"),
    (None, "m:y", "version", "0.9"),
    (None, "m:x", "type", "Module"),
    # the same triple asserted in a named graph AND the default graph
    ("g:2", "m:x", "type", "Module"),
]


def _quads(spark):
    return spark.createDataFrame(
        [(g, s, p, o, True, None, None) for g, s, p, o in Q],
        "graph string, subj string, pred string, obj string, "
        "obj_is_iri boolean, obj_datatype string, obj_lang string")


def test_with_graph_assigns_and_nulls(spark):
    t = spark.createDataFrame(
        [("r1/f", "p", "o"), ("m:x", "p", "o")],
        "subj string, pred string, obj string")
    q = with_graph(
        t, "CASE WHEN subj LIKE 'r1/%' THEN 'g:r1' ELSE NULL END")
    got = {(r.graph, r.subj) for r in q.collect()}
    assert got == {("g:r1", "r1/f"), (None, "m:x")}


def test_graph_variable_binds_named_graphs_only(spark):
    # GRAPH ?g { ?f imports ?m }: default-graph rows never match
    got = {(r.g, r.f, r.m) for r in match_quads(
        _quads(spark), [("?g", "?f", "imports", "?m")]).collect()}
    assert got == {("g:1", "f:a", "m:x"), ("g:1", "f:c", "m:y"),
                   ("g:2", "f:b", "m:x")}


def test_constant_graph_scopes_patterns(spark):
    got = {r.f for r in match_quads(
        _quads(spark), [("g:1", "?f", "imports", "?m")]).collect()}
    assert got == {"f:a", "f:c"}


def test_default_graph_pattern_and_cross_graph_join(spark):
    # GRAPH ?g { ?f imports ?m } . ?m version ?v  (default graph)
    got = {(r.g, r.f, r.m, r.v) for r in match_quads(_quads(spark), [
        ("?g", "?f", "imports", "?m"),
        (None, "?m", "version", "?v"),
    ]).collect()}
    assert got == {("g:1", "f:a", "m:x", "1.2"),
                   ("g:1", "f:c", "m:y", "0.9"),
                   ("g:2", "f:b", "m:x", "1.2")}


def test_same_graph_variable_scopes_a_group(spark):
    # GRAPH ?g { ?f imports ?m . ?f inRepo ?r }: f:c has no inRepo in
    # g:1, and f:a/f:b only match within their OWN graph
    got = {(r.g, r.f, r.r) for r in match_quads(_quads(spark), [
        ("?g", "?f", "imports", "?m"),
        ("?g", "?f", "inRepo", "?r"),
    ]).collect()}
    assert got == {("g:1", "f:a", "r:1"), ("g:2", "f:b", "r:2")}


def test_property_path_inside_constant_graph(spark):
    quads = spark.createDataFrame(
        [("g:1", "a", "dep", "b", True, None, None),
         ("g:1", "b", "dep", "c", True, None, None),
         ("g:2", "c", "dep", "d", True, None, None)],
        "graph string, subj string, pred string, obj string, "
        "obj_is_iri boolean, obj_datatype string, obj_lang string")
    got = {(r.x, r.y) for r in match_quads(
        quads, [("g:1", "?x", "dep+", "?y")]).collect()}
    # the closure stays inside g:1: no a->d leak through g:2's edge
    assert got == {("a", "b"), ("b", "c"), ("a", "c")}


def test_property_path_inside_graph_variable_raises(spark):
    with pytest.raises(ValueError, match="per-graph closure"):
        match_quads(_quads(spark), [("?g", "?x", "dep+", "?y")])


def test_union_graph_set_semantics(spark):
    # m:x type Module exists in g:2 AND the default graph: merged once
    u = union_graph(_quads(spark))
    assert "graph" not in u.columns
    assert u.filter((F.col("subj") == "m:x")
                    & (F.col("pred") == "type")).count() == 1
    assert u.count() == len(Q) - 1


def test_default_and_named_graph_accessors(spark):
    q = _quads(spark)
    assert default_graph(q).count() == 3
    assert {r.graph for r in named_graphs(q).collect()} == {"g:1", "g:2"}


def test_optional_and_filter_compose(spark):
    # imports with an OPTIONAL default-graph version, filtered
    rows = match_quads(
        _quads(spark),
        [("?g", "?f", "imports", "?m")],
        optional=[(None, "?m", "type", "?t")],
        filters=["m = 'm:x'"],
    ).collect()
    got = {(r.g, r.f, r.m, r.t) for r in rows}
    assert got == {("g:1", "f:a", "m:x", "Module"),
                   ("g:2", "f:b", "m:x", "Module")}
