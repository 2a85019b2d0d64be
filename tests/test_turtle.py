"""Turtle sink (operators/turtle.py): roundtrip vs the repo's own TTL
parser, escaping, prefix compaction."""

from __future__ import annotations

import glob
import os

from rdf_tabular_spark.operators.turtle import (
    DEFAULT_PREFIXES, to_turtle_blocks, write_turtle)


def _triples(spark, rows):
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, obj_lang string")


XSD = "http://www.w3.org/2001/XMLSchema#"
CSVW = "http://www.w3.org/ns/csvw#"


def test_block_shapes_and_compaction(spark):
    t = _triples(spark, [
        ("http://ex.org/s1", CSVW + "rownum", "1", False, XSD + "integer", None),
        ("http://ex.org/s1", "http://ex.org/p", "hi there", False, None, "en"),
        ("_:b1", CSVW + "describes", "http://ex.org/s1", True, None, None),
    ])
    blocks = {r.subj: r.block for r in to_turtle_blocks(t).collect()}
    assert blocks["http://ex.org/s1"] == (
        '<http://ex.org/s1> <http://ex.org/p> "hi there"@en ;\n'
        '    csvw:rownum "1"^^xsd:integer .')
    assert blocks["_:b1"] == "_:b1 csvw:describes <http://ex.org/s1> ."


def test_literal_escaping(spark):
    t = _triples(spark, [
        ("http://ex.org/s", "http://ex.org/p",
         'a"b\\c\nd\te', False, None, None)])
    block = to_turtle_blocks(t).collect()[0].block
    assert '"a\\"b\\\\c\\nd\\te"' in block


def test_unsafe_local_name_not_compacted(spark):
    t = _triples(spark, [
        ("http://ex.org/s", XSD + "weird/slash", "x", False, None, None)])
    block = to_turtle_blocks(t).collect()[0].block
    assert "<" + XSD + "weird/slash>" in block and "xsd:weird" not in block


def test_roundtrip_standard_graph(spark, tmp_path):
    import __spark_entry__ as entry
    from tests.ttl import parse_ttl, spark_triples, compare_graphs

    g = entry.q_csvw_triples_standard(spark, "/root/testdata/sf0.001")
    out = write_turtle(g, str(tmp_path / "ttl"))
    doc = open(os.path.join(out, "_prefixes.ttl")).read()
    for p in sorted(glob.glob(os.path.join(out, "blocks", "part-*"))):
        doc += open(p).read()
    parsed = parse_ttl(doc)
    res = compare_graphs(parsed, spark_triples(g))
    assert res["precision"] == 1.0 and res["recall"] == 1.0
