"""RDF 1.1 skolemization (operators/skolem.py)."""

from rdf_tabular_spark.operators.skolem import deskolemize, skolemize

SCHEMA = ("subj string, pred string, obj string, obj_is_iri boolean, "
          "obj_datatype string, obj_lang string")

ROWS = [
    ("_:b0", "e:p", "_:b1", True, None, None),
    ("_:b0", "e:p", "e:x", True, None, None),
    ("e:s", "e:q", "_:b0", True, None, None),
    ("e:s", "e:q", "_:looks-like-a-bnode", False, None, None),  # literal
    ("e:s", "e:r", "plain", False, None, None),
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_skolemize_and_roundtrip(spark):
    t = spark.createDataFrame(ROWS, SCHEMA)
    sk = skolemize(t, "http://ex.org")
    got = _rows(sk)
    gen = "http://ex.org/.well-known/genid/"
    assert (gen + "b0", "e:p", gen + "b1", True, None, None) in got
    assert (gen + "b0", "e:p", "e:x", True, None, None) in got
    assert ("e:s", "e:q", gen + "b0", True, None, None) in got
    # the literal that LOOKS like a bnode label is untouched
    assert ("e:s", "e:q", "_:looks-like-a-bnode", False, None, None) in got
    assert not any(v.startswith("_:") for r in got
                   for v, iri in ((r[0], True), (r[2], r[3])) if iri)
    # exact inverse
    assert _rows(deskolemize(sk, "http://ex.org/")) == _rows(t)


def test_trailing_slash_normalized(spark):
    t = spark.createDataFrame(ROWS[:1], SCHEMA)
    a = _rows(skolemize(t, "http://ex.org"))
    b = _rows(skolemize(t, "http://ex.org/"))
    assert a == b


def test_map_only_plan(spark):
    t = spark.createDataFrame(ROWS, SCHEMA)
    plan = skolemize(t, "http://ex.org")._jdf.queryExecution().toString()
    assert "Exchange" not in plan
