"""Turtle SOURCE (sources/turtle_source.py): grammar subset, per-file
bnode namespacing, sink roundtrip."""

import pytest

from rdf_tabular_spark.operators.turtle import write_turtle
from rdf_tabular_spark.sources.turtle_source import (
    RDF_NS,
    XSD,
    TurtleSyntaxError,
    parse_turtle,
    read_turtle,
    read_turtle_dataset,
)

SCHEMA = ("subj string, pred string, obj string, obj_is_iri boolean, "
          "obj_datatype string, obj_lang string")


def test_prefixes_pnames_and_a():
    got = parse_turtle("""
        @prefix ex: <http://ex.org/> .
        @base <http://base.org/dir/> .
        ex:s a ex:T ;
             ex:p "v"@en , "w"^^ex:dt ;
             ex:q <rel> .
    """)
    assert set(got) == {
        ("http://ex.org/s", RDF_NS + "type", "http://ex.org/T",
         True, None, None),
        ("http://ex.org/s", "http://ex.org/p", "v", False, None, "en"),
        ("http://ex.org/s", "http://ex.org/p", "w", False,
         "http://ex.org/dt", None),
        ("http://ex.org/s", "http://ex.org/q", "http://base.org/dir/rel",
         True, None, None),
    }


def test_sparql_style_directives_and_bare_literals():
    got = parse_turtle("""
        PREFIX ex: <http://ex.org/>
        BASE <http://b.org/>
        ex:s ex:i 42 ; ex:d 3.14 ; ex:e 1e3 ; ex:b true .
    """)
    dts = {(o, dt) for _, _, o, _, dt, _ in got}
    assert dts == {("42", XSD + "integer"), ("3.14", XSD + "decimal"),
                   ("1e3", XSD + "double"), ("true", XSD + "boolean")}


def test_anon_bnodes_and_collections():
    got = parse_turtle("""
        @prefix ex: <http://ex.org/> .
        ex:s ex:p [ ex:q "inner" ] .
        ex:s ex:list ( ex:a "lit" ) .
        ex:s ex:empty () .
    """, bnode_ns="t_")
    by_pred = {}
    for s, p, o, iri, dt, lang in got:
        by_pred.setdefault(p, []).append((s, o, iri))
    inner = by_pred["http://ex.org/p"][0][1]
    assert inner.startswith("_:t_anon")
    assert ("http://ex.org/q" in by_pred
            and by_pred["http://ex.org/q"][0][0] == inner)
    # collection chain: first/rest/nil
    head = by_pred["http://ex.org/list"][0][1]
    firsts = {s: o for s, o, _ in by_pred[RDF_NS + "first"]}
    rests = {s: o for s, o, _ in by_pred[RDF_NS + "rest"]}
    assert firsts[head] == "http://ex.org/a"
    assert firsts[rests[head]] == "lit"
    assert rests[rests[head]] == RDF_NS + "nil"
    assert by_pred["http://ex.org/empty"][0][1] == RDF_NS + "nil"


def test_long_strings_and_escapes():
    got = parse_turtle(r'''
        @prefix ex: <http://ex.org/> .
        ex:s ex:p """multi
line "quoted" text""" ;
             ex:q "tab\t newline\n uA" ;
             ex:r 'single' .
    ''')
    objs = {o for _, _, o, _, _, _ in got}
    assert 'multi\nline "quoted" text' in objs
    assert "tab\t newline\n uA" in objs
    assert "single" in objs


def test_labeled_bnodes_namespaced():
    got = parse_turtle("_:x <http://e/p> _:y .", bnode_ns="f1_")
    assert got == [("_:f1_x", "http://e/p", "_:f1_y", True, None, None)]
    got2 = parse_turtle("_:x <http://e/p> _:y .")
    assert got2 == [("_:x", "http://e/p", "_:y", True, None, None)]


def test_syntax_errors():
    with pytest.raises(TurtleSyntaxError, match="subject"):
        parse_turtle('"lit" <http://e/p> <http://e/o> .')
    with pytest.raises(TurtleSyntaxError):
        parse_turtle("<http://e/s> <http://e/p> <http://e/o>")  # no dot
    with pytest.raises(TurtleSyntaxError):
        parse_turtle("@prefix ex <http://e/> .")  # missing colon


def test_read_turtle_files_namespace_isolation(spark, tmp_path):
    # the same _:b0 in two files must stay two distinct nodes
    for name in ("one.ttl", "two.ttl"):
        (tmp_path / name).write_text(
            "_:b0 <http://e/p> \"%s\" ." % name, encoding="utf-8")
    got = read_turtle(spark, str(tmp_path)).collect()
    assert len({r["subj"] for r in got}) == 2
    assert {r["obj"] for r in got} == {"one.ttl", "two.ttl"}


def test_sink_roundtrip(spark, tmp_path):
    rows = [
        ("http://e/s", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://e/T", True, None, None),
        ("http://e/s", "http://e/p", 'nasty "v"\nline', False, None, None),
        ("http://e/s", "http://e/p", "fr", False, None, "fr"),
        ("http://e/s", "http://e/n", "42", False,
         "http://www.w3.org/2001/XMLSchema#integer", None),
        ("http://e/other", "http://e/p", "http://e/s", True, None, None),
    ]
    triples = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "graph.ttl.d")
    write_turtle(triples, path)
    back = read_turtle_dataset(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_turtle_roundtrip_property(spark):
    """Hypothesis-generated literals through the prefix-compacted sink
    and back — one batched Spark job over all examples."""
    from hypothesis import given, settings, strategies as st

    from rdf_tabular_spark.operators.turtle import (DEFAULT_PREFIXES,
                                                    to_turtle_blocks)
    from rdf_tabular_spark.sources.turtle_source import parse_turtle_blocks

    text = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        min_size=0, max_size=40)
    lang = st.one_of(st.none(), st.sampled_from(["en", "pt-BR"]))
    dt = st.one_of(st.none(), st.sampled_from(
        ["http://www.w3.org/2001/XMLSchema#string",   # compacts
         "http://no-prefix.example/dt"]))             # stays <...>

    collected = []

    @settings(max_examples=60, deadline=None)
    @given(obj=text, lang=lang, dt=dt)
    def gather(obj, lang, dt):
        if lang is not None:
            dt = None
        collected.append(("http://e/s", "http://e/p", obj, False, dt, lang))

    gather()
    rows = sorted(set(collected),
                  key=lambda r: tuple((v is None, v) for v in r))
    triples = spark.createDataFrame(rows, SCHEMA)
    back = parse_turtle_blocks(
        to_turtle_blocks(triples, DEFAULT_PREFIXES), DEFAULT_PREFIXES)
    key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    assert sorted(map(tuple, back.collect()), key=key) == rows
