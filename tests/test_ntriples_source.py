"""N-Triples SOURCE (operators/ntriples.py parse path): the inverse of
the S11 sink. The reference round-trips RDF through rdf.rb's reader
registry (reader.rb:644-649); here parse∘format must be the identity on
the standard triple schema, plus the source must accept foreign
N-Triples text (comments, blank lines, \\uXXXX escapes) and surface
malformed lines through the problems channel instead of eating them.
"""

import pytest

from rdf_tabular_spark.operators.ntriples import (
    ntriples_parse_problems,
    parse_ntriples_lines,
    to_ntriples_lines,
)

SCHEMA = ("subj string, pred string, obj string, obj_is_iri boolean, "
          "obj_datatype string, obj_lang string")


def _lines(spark, *lines):
    return spark.createDataFrame([(ln,) for ln in lines], "line string")


def _rows(df):
    return sorted((tuple(r) for r in df.collect()),
                  key=lambda t: tuple((v is None, v) for v in t))


TRICKY = [
    # IRIs / bnodes in every position
    ("http://e/s", "http://e/p", "http://e/o", True, None, None),
    ("_:b0", "http://e/p", "_:b1", True, None, None),
    # plain / lang / typed literals
    ("http://e/s", "http://e/p", "plain", False, None, None),
    ("http://e/s", "http://e/p", "hola", False, None, "es-419"),
    ("http://e/s", "http://e/p", "42", False,
     "http://www.w3.org/2001/XMLSchema#integer", None),
    # escape soup: quote, backslash-n vs newline, tab, trailing backslash
    ("http://e/s", "http://e/p", 'say "hi"', False, None, None),
    ("http://e/s", "http://e/p", "literal\\n-not-newline", False, None, None),
    ("http://e/s", "http://e/p", "real\nnewline\tand tab", False, None, None),
    ("http://e/s", "http://e/p", "trailing backslash\\", False, None, None),
    ("http://e/s", "http://e/p", "\\\\double", False, None, None),
    # non-ASCII passes through raw (N-Triples is UTF-8)
    ("http://e/s", "http://e/p", "snowman ☃ café", False,
     None, None),
]


def test_roundtrip_identity(spark):
    triples = spark.createDataFrame(TRICKY, SCHEMA)
    back = parse_ntriples_lines(to_ntriples_lines(triples))
    assert _rows(back) == _rows(triples)


def test_skips_comments_and_blanks(spark):
    df = _lines(
        spark,
        "# a comment",
        "",
        "   ",
        "<http://e/s> <http://e/p> <http://e/o> .",
        "\t# indented comment",
    )
    assert _rows(parse_ntriples_lines(df)) == [
        ("http://e/s", "http://e/p", "http://e/o", True, None, None)]
    assert ntriples_parse_problems(df).count() == 0


def test_numeric_escapes_python_path(spark):
    # \u / \U lines route through the Arrow-batched decoder
    df = _lines(
        spark,
        '<http://e/s> <http://e/p> "caf\\u00e9" .',
        '<http://e/s> <http://e/p> "g-clef \\U0001D11E"@en .',
        '<http://e/s> <http://e/p> "mixed \\u0041\\t\\"q\\"" .',
    )
    assert _rows(parse_ntriples_lines(df)) == sorted([
        ("http://e/s", "http://e/p", 'g-clef \U0001D11E', False, None, "en"),
        ("http://e/s", "http://e/p", 'mixed A\t"q"', False, None, None),
        ("http://e/s", "http://e/p", "café", False, None, None),
    ])


def test_native_and_python_paths_agree(spark):
    """The same escape-free line must decode identically on both paths
    (the router picks by \\u presence; the paths may not diverge)."""
    from rdf_tabular_spark.operators.ntriples import _parse_lines_python

    lines = [
        '<http://e/s> <http://e/p> "a\\\\n\\tb \\"q\\""@en-GB .',
        '<http://e/s> <http://e/p> "x\\\\\\\\y" .',
        '_:b0 <http://e/p> "1"^^<http://www.w3.org/2001/XMLSchema#int> .',
    ]
    df = _lines(spark, *lines)
    native = _rows(parse_ntriples_lines(df))
    python = _rows(_parse_lines_python(df, "line"))
    assert native == python


def test_problems_channel(spark):
    df = _lines(
        spark,
        "<http://e/s> <http://e/p> <http://e/o> .",
        "<http://e/s> <http://e/p> <http://e/o>",      # no dot
        "<http://e/s> nonsense .",                       # bad pred
        '<http://e/s> <http://e/p> "unterminated .',    # bad literal
        "just text",
    )
    assert parse_ntriples_lines(df).count() == 1
    assert ntriples_parse_problems(df).count() == 4


def test_datatype_lookalikes_inside_literal(spark):
    # ^^<...> and @lang INSIDE the literal body must not be mistaken
    # for term metadata
    df = _lines(
        spark,
        '<http://e/s> <http://e/p> "a^^<http://fake>" .',
        '<http://e/s> <http://e/p> "user@example" .',
        '<http://e/s> <http://e/p> "b^^<http://fake>"^^<http://real> .',
    )
    assert _rows(parse_ntriples_lines(df)) == [
        ("http://e/s", "http://e/p", "a^^<http://fake>", False, None, None),
        ("http://e/s", "http://e/p", "b^^<http://fake>", False,
         "http://real", None),
        ("http://e/s", "http://e/p", "user@example", False, None, None),
    ]


def test_read_ntriples_file(spark, tmp_path):
    from rdf_tabular_spark.operators.ntriples import (read_ntriples,
                                                      write_ntriples)

    triples = spark.createDataFrame(TRICKY, SCHEMA)
    path = str(tmp_path / "graph.nt")
    write_ntriples(triples, path)
    assert _rows(read_ntriples(spark, path)) == _rows(triples)


@pytest.mark.parametrize("bad", [
    "<http://e/s> <http://e/p> ?var .",            # variables are not NT
    "<http://e s> <http://e/p> <http://e/o> .",    # space inside IRI
    '<http://e/s> <http://e/p> "x"@ .',            # empty lang tag
])
def test_grammar_rejects(spark, bad):
    df = _lines(spark, bad)
    assert parse_ntriples_lines(df).count() == 0
    assert ntriples_parse_problems(df).count() == 1


# ------------------------------------------------------------- N-Quads

QSCHEMA = SCHEMA + ", graph string"

QROWS = [
    ("http://e/s", "http://e/p", "http://e/o", True, None, None, "http://g/1"),
    ("http://e/s", "http://e/p", "dflt", False, None, None, None),
    ("_:b0", "http://e/p", "x\ny", False, None, "en", "_:gb"),
    ("http://e/s", "http://e/n", "42", False,
     "http://www.w3.org/2001/XMLSchema#int", None, "http://g/2"),
]


def test_nquads_roundtrip(spark):
    from rdf_tabular_spark.operators.ntriples import (parse_nquads_lines,
                                                      to_nquads_lines)

    quads = spark.createDataFrame(QROWS, QSCHEMA)
    back = parse_nquads_lines(to_nquads_lines(quads))
    assert _rows(back) == _rows(quads)


def test_nquads_default_graph_is_plain_triple_line(spark):
    from rdf_tabular_spark.operators.ntriples import to_nquads_lines

    quads = spark.createDataFrame(QROWS[1:2], QSCHEMA)
    [r] = to_nquads_lines(quads).collect()
    assert r["line"] == '<http://e/s> <http://e/p> "dflt" .'


def test_nquads_accepts_triple_lines_as_default(spark):
    from rdf_tabular_spark.operators.ntriples import parse_nquads_lines

    df = _lines(spark, "<http://e/s> <http://e/p> <http://e/o> .")
    [r] = parse_nquads_lines(df).collect()
    assert r["graph"] is None


def test_nquads_numeric_escape_path(spark):
    from rdf_tabular_spark.operators.ntriples import parse_nquads_lines

    df = _lines(
        spark, '<http://e/s> <http://e/p> "caf\\u00e9" <http://g/\\u0031> .')
    [r] = parse_nquads_lines(df).collect()
    assert (r["obj"], r["graph"]) == ("café", "http://g/1")


def test_nquads_problems(spark):
    from rdf_tabular_spark.operators.ntriples import (nquads_parse_problems,
                                                      parse_nquads_lines)

    df = _lines(
        spark,
        '<http://e/s> <http://e/p> "v" <http://g/1> .',
        '<http://e/s> <http://e/p> "v" "litgraph" .',   # literal graph: bad
        "# comment",
    )
    assert parse_nquads_lines(df).count() == 1
    assert nquads_parse_problems(df).count() == 1


# ---------------------------------------------- property-based roundtrip

def test_roundtrip_property(spark):
    """Hypothesis-generated adversarial literals (quotes, backslashes,
    control chars, unicode, lang/datatype soup) must survive
    format→parse bit-exactly — one batched Spark job over all examples
    (per-example jobs would be 100× slower)."""
    from hypothesis import given, settings, strategies as st

    text = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",),  # no lone surrogates
        ), min_size=0, max_size=40)
    lang = st.one_of(st.none(), st.sampled_from(["en", "en-GB", "es-419"]))
    dt = st.one_of(st.none(), st.sampled_from(
        ["http://www.w3.org/2001/XMLSchema#string", "http://e/dt"]))

    collected = []

    @settings(max_examples=60, deadline=None)
    @given(obj=text, lang=lang, dt=dt)
    def gather(obj, lang, dt):
        if lang is not None:
            dt = None
        collected.append(
            ("http://e/s", "http://e/p", obj, False, dt, lang))

    gather()
    rows = sorted(set(collected),
                  key=lambda r: tuple((v is None, v) for v in r))
    triples = spark.createDataFrame(rows, SCHEMA)
    back = parse_ntriples_lines(to_ntriples_lines(triples))
    assert _rows(back) == _rows(triples)

    # same corpus through the quad grammar
    from rdf_tabular_spark.operators.ntriples import (parse_nquads_lines,
                                                      to_nquads_lines)
    quads = spark.createDataFrame(
        [r + ("http://g/1",) for r in rows], QSCHEMA)
    qback = parse_nquads_lines(to_nquads_lines(quads))
    assert _rows(qback) == _rows(quads)
