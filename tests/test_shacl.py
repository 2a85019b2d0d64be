"""SHACL-lite graph validation (kg/shacl.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_tabular_spark.csvw.datatypes import RDF_TYPE
from rdf_tabular_spark.kg import shacl

XSD = "http://www.w3.org/2001/XMLSchema#"


def _triples(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, iri, dt, None) for s, p, o, iri, dt in rows],
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, obj_lang string")


def _g(spark):
    return _triples(spark, [
        ("f1", RDF_TYPE, "File", True, None),
        ("f1", "sha", "abc", False, XSD + "hexBinary"),
        ("f1", "imports", "m1", True, None),
        ("f2", RDF_TYPE, "File", True, None),          # missing sha
        ("f3", RDF_TYPE, "File", True, None),
        ("f3", "sha", "x1", False, XSD + "hexBinary"), # two shas
        ("f3", "sha", "x2", False, XSD + "hexBinary"),
        ("f3", "imports", "ghost", True, None),        # untyped target
        ("m1", RDF_TYPE, "Module", True, None),
        ("other", "sha", "zzz", False, None),          # not a target
    ])


def test_cardinality_violations(spark):
    out = shacl.validate_shapes(_g(spark), [
        {"name": "S", "target_class": "File", "property": "sha",
         "min_count": 1, "max_count": 1}])
    got = {(r.focus, r.detail) for r in out.collect()}
    assert got == {("f2", "0"), ("f3", "2")}


def test_class_constraint(spark):
    out = shacl.validate_shapes(_g(spark), [
        {"name": "S", "target_class": "File", "property": "imports",
         "class": "Module"}])
    got = {(r.focus, r.detail) for r in out.collect()}
    assert got == {("f3", "ghost")}


def test_nodekind_and_datatype(spark):
    g = _triples(spark, [
        ("f1", RDF_TYPE, "File", True, None),
        ("f1", "sha", "abc", False, None),             # plain, not hexBinary
        ("f1", "imports", "literal-dep", False, None), # literal where IRI due
    ])
    out1 = shacl.validate_shapes(g, [
        {"name": "S", "target_class": "File", "property": "sha",
         "datatype": XSD + "hexBinary"}])
    assert [(r.focus, r.detail) for r in out1.collect()] == [("f1", "plain")]
    out2 = shacl.validate_shapes(g, [
        {"name": "S", "target_class": "File", "property": "imports",
         "node_kind": "IRI"}])
    assert [(r.focus, r.detail) for r in out2.collect()] == [("f1", "literal-dep")]


def test_conformant_graph_empty_report(spark):
    g = _triples(spark, [
        ("f1", RDF_TYPE, "File", True, None),
        ("f1", "sha", "abc", False, XSD + "hexBinary"),
    ])
    out = shacl.validate_shapes(g, [
        {"name": "S", "target_class": "File", "property": "sha",
         "min_count": 1, "max_count": 1, "datatype": XSD + "hexBinary"}])
    assert out.isEmpty()


def test_no_shapes_raises(spark):
    with pytest.raises(ValueError):
        shacl.validate_shapes(_g(spark), [])


def test_pattern_constraint(spark):
    g = _triples(spark, [
        ("f1", RDF_TYPE, "File", True, None),
        ("f1", "path", "src/ok.py", False, None),
        ("f2", RDF_TYPE, "File", True, None),
        ("f2", "path", "weird.txt", False, None),
        ("f2", "ref", "src/iri-not-checked", True, None),
    ])
    out = shacl.validate_shapes(g, [
        {"name": "P", "target_class": "File", "property": "path",
         "pattern": r"\.py$"},
        {"name": "P2", "target_class": "File", "property": "ref",
         "pattern": r"^never"}])  # IRI values: pattern doesn't apply
    assert [(r.focus, r.constraint, r.detail) for r in out.collect()] == [
        ("f2", "pattern", "weird.txt")]


def test_in_constraint(spark):
    g = _triples(spark, [
        ("f1", RDF_TYPE, "File", True, None),
        ("f1", "lang", "python", False, None),
        ("f2", RDF_TYPE, "File", True, None),
        ("f2", "lang", "cobol", False, None),
    ])
    out = shacl.validate_shapes(g, [
        {"name": "L", "target_class": "File", "property": "lang",
         "in": ["python", "ruby"]}])
    assert [(r.focus, r.detail) for r in out.collect()] == [("f2", "cobol")]


def test_range_constraint(spark):
    g = _triples(spark, [
        ("s1", RDF_TYPE, "Sym", True, None),
        ("s1", "idx", "2", False, None),
        ("s2", RDF_TYPE, "Sym", True, None),
        ("s2", "idx", "7", False, None),      # above max
        ("s3", RDF_TYPE, "Sym", True, None),
        ("s3", "idx", "-1", False, None),     # below min
        ("s4", RDF_TYPE, "Sym", True, None),
        ("s4", "idx", "NaNish", False, None), # non-numeric literal
    ])
    out = shacl.validate_shapes(g, [
        {"name": "R", "target_class": "Sym", "property": "idx",
         "min_inclusive": 0, "max_inclusive": 5}])
    assert sorted((r.focus, r.detail) for r in out.collect()) == [
        ("s2", "7"), ("s3", "-1"), ("s4", "NaNish")]
