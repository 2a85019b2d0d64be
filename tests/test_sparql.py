"""SPARQL text front-end (kg/sparql.py): every parsed form must agree
with the programmatic kg/query.py API it compiles onto."""

from __future__ import annotations

import re

import pytest

from rdf_tabular_spark.kg.query import match_bgp
from rdf_tabular_spark.kg.sparql import (SparqlSyntaxError,
                                         SparqlUnsupportedError, sparql)

T = [
    ("f:a", "k:imports", "m:x", True, None, None),
    ("f:a", "k:inRepo", "r:1", True, None, None),
    ("f:a", "k:label", "hello", False, None, "en"),
    ("f:a", "k:label", "bonjour", False, None, "fr"),
    ("f:a", "k:size", "42", False, "xsd:integer", None),
    ("f:b", "k:imports", "m:x", True, None, None),
    ("f:b", "k:inRepo", "r:2", True, None, None),
    ("f:b", "k:size", "7", False, "xsd:integer", None),
    ("f:c", "k:imports", "m:y", True, None, None),
    ("f:c", "k:inRepo", "r:1", True, None, None),
    ("m:x", "k:type", "k:Module", True, None, None),
    ("m:y", "k:type", "k:Module", True, None, None),
    ("m:x", "k:dep", "m:y", True, None, None),
    ("m:y", "k:dep", "m:z", True, None, None),
    ("r:1", "k:name", "monorepo", False, None, None),
]


def _t(spark):
    return spark.createDataFrame(
        T, "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, obj_lang string")


def rows(df, *cols):
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t))


# ----------------------------------------------------------- SELECT core

def test_select_basic(spark):
    got = sparql(_t(spark), """
        SELECT ?f ?m WHERE { ?f k:imports ?m . ?m k:type k:Module }
    """)
    assert rows(got, "f", "m") == [
        ("f:a", "m:x"), ("f:b", "m:x"), ("f:c", "m:y")]


def test_select_star_and_semicolon_comma(spark):
    got = sparql(_t(spark), """
        SELECT * WHERE { ?f k:imports ?m ; k:inRepo r:1 . }
    """)
    assert set(got.columns) == {"f", "m"}
    assert rows(got, "f", "m") == [("f:a", "m:x"), ("f:c", "m:y")]


def test_prefix_expansion(spark):
    t = spark.createDataFrame(
        [("http://e.org/s", "http://e.org/p", "o", True, None, None)],
        _t(spark).schema)
    got = sparql(t, """
        PREFIX ex: <http://e.org/>
        SELECT ?s WHERE { ?s ex:p ?o }
    """)
    assert rows(got, "s") == [("http://e.org/s",)]


def test_undeclared_prefix_matches_compact_terms(spark):
    got = sparql(_t(spark), "SELECT ?f WHERE { ?f k:inRepo r:1 }")
    assert rows(got, "f") == [("f:a",), ("f:c",)]


def test_filter_regex_and_comparison(spark):
    got = sparql(_t(spark), """
        SELECT ?r ?n WHERE { ?r k:name ?n FILTER(REGEX(?n, "mono")) }
    """)
    assert rows(got, "r", "n") == [("r:1", "monorepo")]


def test_filter_numeric_typed_literal(spark):
    got = sparql(_t(spark), """
        SELECT ?f WHERE { ?f k:size ?s
            FILTER(CAST(?s AS INT) > "10"^^xsd:integer) }
    """) if False else sparql(_t(spark), """
        SELECT ?f WHERE { ?f k:size ?s FILTER(?s > "10"^^xsd:integer) }
    """)
    # string-vs-int comparison casts the column in Spark SQL
    assert rows(got, "f") == [("f:a",)]


def test_optional_keeps_unmatched(spark):
    got = sparql(_t(spark), """
        SELECT ?m ?d WHERE { ?m k:type k:Module OPTIONAL { ?m k:dep ?d } }
    """)
    assert rows(got, "m", "d") == [("m:x", "m:y"), ("m:y", "m:z")]
    got2 = sparql(_t(spark), """
        SELECT ?f ?s WHERE { ?f k:imports ?m OPTIONAL { ?f k:size ?s } }
    """)
    assert rows(got2, "f", "s") == [
        ("f:a", "42"), ("f:b", "7"), ("f:c", None)]


def test_union_null_pads_disjoint_vars(spark):
    got = sparql(_t(spark), """
        SELECT ?f ?r ?s WHERE {
            { ?f k:inRepo ?r } UNION { ?f k:size ?s }
        }
    """)
    assert (None, "r:1", None) not in rows(got, "f", "r", "s")
    assert ("f:a", "r:1", None) in rows(got, "f", "r", "s")
    assert ("f:a", None, "42") in rows(got, "f", "r", "s")


def test_minus(spark):
    got = sparql(_t(spark), """
        SELECT ?f WHERE { ?f k:imports ?m MINUS { ?f k:inRepo r:1 } }
    """)
    assert rows(got, "f") == [("f:b",)]


def test_minus_disjoint_removes_nothing(spark):
    got = sparql(_t(spark), """
        SELECT ?f WHERE { ?f k:inRepo r:1 MINUS { ?x k:name ?n } }
    """)
    assert rows(got, "f") == [("f:a",), ("f:c",)]


def test_not_exists_and_exists(spark):
    got = sparql(_t(spark), """
        SELECT ?m WHERE { ?m k:type k:Module
            FILTER NOT EXISTS { ?m k:dep m:z } }
    """)
    assert rows(got, "m") == [("m:x",)]
    got2 = sparql(_t(spark), """
        SELECT ?m WHERE { ?m k:type k:Module
            FILTER EXISTS { ?m k:dep ?d } }
    """)
    assert rows(got2, "m") == [("m:x",), ("m:y",)]


def test_bind(spark):
    got = sparql(_t(spark), """
        SELECT ?f ?local WHERE {
            ?f k:imports ?m BIND(SUBSTR(?m, 3) AS ?local)
            FILTER(?local = "x")
        }
    """)
    assert rows(got, "f", "local") == [("f:a", "x"), ("f:b", "x")]


def test_trailing_values_postlude(spark):
    """§18.2.4.6: a VALUES clause after the solution modifiers joins
    into the query pattern."""
    got = sparql(_t(spark), """
        SELECT ?f WHERE { ?f k:imports ?m } VALUES ?m { m:x }
    """)
    assert rows(got, "f") == [("f:a",), ("f:b",)]
    # composes with modifiers (which apply AFTER the join)
    top = sparql(_t(spark), """
        SELECT ?f ?m WHERE { ?f k:imports ?m }
        ORDER BY ?f LIMIT 1 VALUES ?m { m:y }
    """)
    assert rows(top, "f", "m") == [("f:c", "m:y")]
    # multi-variable form
    multi = sparql(_t(spark), """
        SELECT ?f WHERE { ?f k:imports ?m ; k:inRepo ?r }
        VALUES (?m ?r) { (m:x r:1) (m:y r:1) }
    """)
    assert rows(multi, "f") == [("f:a",), ("f:c",)]


def test_datetime_accessor_builtins(spark):
    """XPath dateTime accessors read the LEXICAL form (the literal's
    own timezone, per spec — no UTC normalization)."""
    got = sparql(_t(spark), """
        SELECT ?y ?mo ?d ?h ?mi ?s ?tz ?dur WHERE {
          ?f k:imports m:x .
          BIND("2024-03-05T10:30:02.25+05:30" AS ?t)
          BIND(YEAR(?t) AS ?y)     BIND(MONTH(?t) AS ?mo)
          BIND(DAY(?t) AS ?d)      BIND(HOURS(?t) AS ?h)
          BIND(MINUTES(?t) AS ?mi) BIND(SECONDS(?t) AS ?s)
          BIND(TZ(?t) AS ?tz)      BIND(TIMEZONE(?t) AS ?dur)
        } LIMIT 1
    """).collect()[0]
    assert (got["y"], got["mo"], got["d"], got["h"], got["mi"]) == \
        (2024, 3, 5, 10, 30)
    assert got["s"] == 2.25
    assert got["tz"] == "+05:30"
    assert got["dur"] == "PT5H30M"


def test_datetime_accessor_edges(spark):
    """Z / negative-offset / absent-timezone / non-dateTime edges."""
    got = sparql(_t(spark), """
        SELECT ?zt ?zd ?nd ?at ?ad ?bad WHERE {
          ?f k:imports m:x .
          BIND(TZ("2024-01-01T00:00:00Z") AS ?zt)
          BIND(TIMEZONE("2024-01-01T00:00:00Z") AS ?zd)
          BIND(TIMEZONE("2024-01-01T00:00:00-05:00") AS ?nd)
          BIND(TZ("2024-01-01T00:00:00") AS ?at)
          BIND(TIMEZONE("2024-01-01T00:00:00") AS ?ad)
          BIND(YEAR("not a date") AS ?bad)
        } LIMIT 1
    """).collect()[0]
    assert got["zt"] == "Z" and got["zd"] == "PT0S"
    assert got["nd"] == "-PT5H"
    assert got["at"] == "" and got["ad"] is None
    assert got["bad"] is None


def test_datetime_accessors_batch_vs_python(spark):
    """Batch property check: a seeded sample of lexical dateTimes
    (edge hours, fractional variants, every timezone shape) must agree
    component-for-component with Python's own parse of the lexical
    form — one Spark query for the whole sample."""
    import random
    rng = random.Random(42)
    tzs = ["", "Z", "+00:00", "-00:00", "+05:30", "-11:45", "+14:00",
           "-00:30"]
    lex = []
    for i in range(200):
        y, mo, d = rng.randint(1, 9999), rng.randint(1, 12), \
            rng.randint(1, 28)
        h, mi = rng.choice([0, 23, rng.randint(0, 23)]), rng.randint(0, 59)
        s = rng.randint(0, 59)
        frac = rng.choice(["", f".{rng.randint(0, 9)}",
                           f".{rng.randint(0, 999999):06d}"])
        lex.append((f"d:{i}",
                    f"{y:04d}-{mo:02d}-{d:02d}T{h:02d}:{mi:02d}:"
                    f"{s:02d}{frac}{rng.choice(tzs)}"))
    t = spark.createDataFrame(
        [(s, "p:t", v, False, "xsd:dateTime", None) for s, v in lex],
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, obj_lang string")
    got = {r["x"]: r for r in sparql(t, """
        SELECT ?x ?y ?mo ?d ?h ?mi ?s ?tz ?dur WHERE {
          ?x <p:t> ?t .
          BIND(YEAR(?t) AS ?y)     BIND(MONTH(?t) AS ?mo)
          BIND(DAY(?t) AS ?d)      BIND(HOURS(?t) AS ?h)
          BIND(MINUTES(?t) AS ?mi) BIND(SECONDS(?t) AS ?s)
          BIND(TZ(?t) AS ?tz)      BIND(TIMEZONE(?t) AS ?dur)
        }
    """).collect()}
    assert len(got) == 200
    for subj, v in lex:
        r = got[subj]
        assert (r["y"], r["mo"], r["d"]) == \
            (int(v[0:4]), int(v[5:7]), int(v[8:10])), v
        assert (r["h"], r["mi"]) == (int(v[11:13]), int(v[14:16])), v
        body = v.split("T", 1)[1]
        m = re.match(r"\d{2}:\d{2}:(\d{2}(?:\.\d+)?)", body)
        assert r["s"] == float(m.group(1)), v
        tz = re.search(r"(Z|[+-]\d{2}:\d{2})$", v)
        tz = tz.group(1) if tz else ""
        assert r["tz"] == tz, v
        if tz == "":
            assert r["dur"] is None, v
        else:
            if tz == "Z" or tz.endswith("00:00"):
                want = "PT0S"
            else:
                sign = "-" if tz[0] == "-" else ""
                hh, mm = int(tz[1:3]), int(tz[4:6])
                want = sign + "PT" + (f"{hh}H" if hh else "") + \
                    (f"{mm}M" if mm else "")
            assert r["dur"] == want, (v, r["dur"], want)


def test_nondeterministic_builtins_rejected(spark):
    for fn in ("NOW()", "RAND()", "UUID()", "STRUUID()"):
        with pytest.raises(SparqlUnsupportedError, match="nondeterministic"):
            sparql(_t(spark), f"""
                SELECT ?f WHERE {{ ?f k:imports ?m
                                   BIND({fn} AS ?x) }}
            """)


def test_constructor_and_hash_builtins(spark):
    """IRI minting, percent-encoding and the hash builtins — the
    CONSTRUCT-workflow function set."""
    import hashlib
    got = sparql(_t(spark), """
        SELECT ?u WHERE {
            ?f k:imports ?m BIND(IRI(CONCAT("urn:mod:", ?m)) AS ?u)
            FILTER(?f = f:a)
        }
    """)
    assert rows(got, "u") == [("urn:mod:m:x",)]
    # BASE resolves relative IRI() arguments
    base = sparql(_t(spark), """BASE <http://e.org/>
        SELECT ?u WHERE { ?f k:imports ?m BIND(IRI(?m) AS ?u)
                          FILTER(?f = f:a) }""")
    assert rows(base, "u") == [("http://e.org/m:x",)]
    enc = sparql(_t(spark), """
        SELECT ?e WHERE {
            ?f k:label ?v BIND(ENCODE_FOR_URI("a b*c~d/e") AS ?e)
        } LIMIT 1
    """)
    assert rows(enc, "e") == [("a%20b%2Ac~d%2Fe",)]
    sha = sparql(_t(spark), """
        SELECT ?h WHERE { f:a k:imports ?m BIND(SHA256(STR(?m)) AS ?h) }
    """)
    assert rows(sha, "h") == [
        (hashlib.sha256(b"m:x").hexdigest(),)]
    md = sparql(_t(spark), """
        SELECT ?h WHERE { f:a k:imports ?m BIND(MD5(STR(?m)) AS ?h) }
    """)
    assert rows(md, "h") == [(hashlib.md5(b"m:x").hexdigest(),)]
    # STRDT/STRLANG: lexical form (documented divergence)
    dt = sparql(_t(spark), """
        SELECT ?v WHERE { f:a k:imports ?m
            BIND(STRDT("5", <http://www.w3.org/2001/XMLSchema#int>) AS ?v) }
    """)
    assert rows(dt, "v") == [("5",)]


def test_values_single_and_multi(spark):
    got = sparql(_t(spark), """
        SELECT ?f WHERE { ?f k:inRepo ?r VALUES ?r { r:1 } }
    """)
    assert rows(got, "f") == [("f:a",), ("f:c",)]
    got2 = sparql(_t(spark), """
        SELECT ?f WHERE { ?f k:inRepo ?r
            VALUES (?f ?r) { (f:a r:1) (f:b r:2) } }
    """)
    assert rows(got2, "f") == [("f:a",), ("f:b",)]


def test_values_undef(spark):
    """UNDEF cells leave their variable unconstrained for that row."""
    und = sparql(_t(spark), """
        SELECT ?f ?r WHERE { ?f k:inRepo ?r
            VALUES (?f ?r) { (f:a UNDEF) (UNDEF r:2) } }
    """)
    assert rows(und, "f", "r") == [("f:a", "r:1"), ("f:b", "r:2")]
    # single-variable form: an UNDEF row is a pure wildcard
    wild = sparql(_t(spark), """
        SELECT ?f WHERE { ?f k:inRepo ?r VALUES ?r { UNDEF } }
    """)
    assert rows(wild, "f") == [("f:a",), ("f:b",), ("f:c",)]
    # a uniform binding pattern (UNDEF on the same column everywhere)
    # reduces to a narrower VALUES table and may even start the group
    lead = sparql(_t(spark), """
        SELECT ?f ?r WHERE { VALUES (?f ?r) { (f:a UNDEF) }
                             ?f k:inRepo ?r }
    """)
    assert rows(lead, "f", "r") == [("f:a", "r:1")]
    # heterogeneous rows need the patterns first: cannot start a group
    with pytest.raises(SparqlUnsupportedError, match="UNDEF"):
        sparql(_t(spark), """
            SELECT ?f WHERE { VALUES (?f ?r) { (f:a UNDEF) (UNDEF r:2) }
                              ?f k:inRepo ?r }
        """)


def test_subselect(spark):
    got = sparql(_t(spark), """
        SELECT ?f ?n WHERE {
            ?f k:imports ?m
            { SELECT ?m (COUNT(?f2) AS ?n) WHERE { ?f2 k:imports ?m }
              GROUP BY ?m }
        }
    """)
    assert rows(got, "f", "n") == [
        ("f:a", 2), ("f:b", 2), ("f:c", 1)]


# ----------------------------------------------------- paths / modifiers

def test_property_path_plus_and_inverse(spark):
    got = sparql(_t(spark), "SELECT ?x WHERE { m:x k:dep+ ?x }")
    assert rows(got, "x") == [("m:y",), ("m:z",)]
    inv = sparql(_t(spark), "SELECT ?x WHERE { ?x ^k:imports f:a }")
    assert rows(inv, "x") == [("m:x",)]


def test_property_path_sequence_and_alternation(spark):
    got = sparql(_t(spark), "SELECT ?f ?d WHERE { ?f k:imports/k:dep ?d }")
    assert rows(got, "f", "d") == [
        ("f:a", "m:y"), ("f:b", "m:y"), ("f:c", "m:z")]
    alt = sparql(_t(spark), "SELECT ?o WHERE { f:a k:imports|k:inRepo ?o }")
    assert rows(alt, "o") == [("m:x",), ("r:1",)]


def test_negated_property_set(spark):
    got = sparql(_t(spark),
                 "SELECT ?p ?o WHERE { f:a !(k:label|k:size) ?o . f:a ?p ?o }")
    assert rows(got, "p", "o") == [("k:imports", "m:x"), ("k:inRepo", "r:1")]


def test_unsupported_path_combo_raises(spark):
    with pytest.raises(SparqlUnsupportedError, match="alternation"):
        sparql(_t(spark), "SELECT ?x WHERE { m:x (k:dep+|k:imports)+ ?x }")


def test_negated_set_with_inverse_members(spark):
    """§9.1 mixed negated sets: forward edges outside the forward
    members UNION reversed edges outside the inverse members."""
    got = sparql(_t(spark),
                 "SELECT ?x WHERE { m:x !(k:dep|^k:dep) ?x }")
    assert rows(got, "x") == [("f:a",), ("f:b",), ("k:Module",)]
    # inverse-only set: reversed edges only, banned pred excluded
    inv = sparql(_t(spark), "SELECT ?x WHERE { m:x !(^k:dep) ?x }")
    assert rows(inv, "x") == [("f:a",), ("f:b",)]
    none = sparql(_t(spark), "SELECT ?x WHERE { m:x !(^k:imports) ?x }")
    assert rows(none, "x") == []


def test_inverse_distributes_over_alternation(spark):
    """^(a|b) == ^a|^b — NOT (^a)|b, which a prefix concat would give."""
    got = sparql(_t(spark),
                 "SELECT ?x WHERE { m:y ^(k:imports|k:dep) ?x }")
    assert rows(got, "x") == [("f:c",), ("m:x",)]


def test_sequence_closure_path(spark):
    """(p/q)+ closes the COMPOSED edge set — pairs reachable by one or
    more whole p∘q hops, not by a dangling p step."""
    # dep chain: m:x -> m:y -> m:z; (dep/dep) composite edge: x -> z
    got = sparql(_t(spark), "SELECT ?x WHERE { m:x (k:dep/k:dep)+ ?x }")
    assert rows(got, "x") == [("m:z",)]
    # zero-or-one on a sequence: imports∘dep in one optional hop
    opt = sparql(_t(spark),
                 "SELECT ?x WHERE { f:a (k:imports/k:dep)? ?x }")
    assert ("m:y",) in rows(opt, "x")        # the one-hop composite
    assert ("f:a",) in rows(opt, "x")        # the zero-length path
    # inverse of a sequence closure: ^((dep/dep)+) == (^dep/^dep)+
    inv = sparql(_t(spark), "SELECT ?x WHERE { m:z ^(k:dep/k:dep)+ ?x }")
    assert rows(inv, "x") == [("m:x",)]
    # a closure step inside a sequence: imports then (dep/dep)+
    mix = sparql(_t(spark),
                 "SELECT ?x WHERE { f:a k:imports/(k:dep/k:dep)+ ?x }")
    assert rows(mix, "x") == [("m:z",)]


def test_closed_alternation_path_text(spark):
    """(p|q)+ closes the union of the edge sets; the bare p+|q+ form
    stays the union of the closures."""
    got = sparql(_t(spark),
                 "SELECT ?x WHERE { f:a (k:imports|k:dep)+ ?x }")
    assert rows(got, "x") == [("m:x",), ("m:y",), ("m:z",)]
    bare = sparql(_t(spark),
                  "SELECT ?x WHERE { f:a k:imports+|k:dep+ ?x }")
    assert rows(bare, "x") == [("m:x",)]
    # inverse member: everything that reaches m:y via dep or ^dep steps
    eq = sparql(_t(spark),
                "SELECT ?x WHERE { m:y (k:dep|^k:dep)* ?x }")
    assert rows(eq, "x") == [("m:x",), ("m:y",), ("m:z",)]


def test_order_limit_offset(spark):
    got = sparql(_t(spark), """
        SELECT ?f WHERE { ?f k:imports ?m } ORDER BY ?f LIMIT 2 OFFSET 1
    """)
    assert [r.f for r in got.collect()] == ["f:b", "f:c"]
    desc = sparql(_t(spark), """
        SELECT ?f WHERE { ?f k:imports ?m } ORDER BY DESC(?f) LIMIT 1
    """)
    assert [r.f for r in desc.collect()] == ["f:c"]


# ------------------------------------------------------------ aggregates

def test_group_by_count_having(spark):
    got = sparql(_t(spark), """
        SELECT ?m (COUNT(?f) AS ?n) WHERE { ?f k:imports ?m }
        GROUP BY ?m HAVING (COUNT(?f) > 1)
    """)
    assert rows(got, "m", "n") == [("m:x", 2)]


def test_count_distinct_and_star(spark):
    got = sparql(_t(spark), """
        SELECT (COUNT(*) AS ?rows) (COUNT(DISTINCT ?m) AS ?mods)
        WHERE { ?f k:imports ?m }
    """)
    r = got.collect()[0]
    assert (r["rows"], r["mods"]) == (3, 2)


def test_group_concat_sorted(spark):
    got = sparql(_t(spark), """
        SELECT ?m (GROUP_CONCAT(?f; SEPARATOR ",") AS ?fs)
        WHERE { ?f k:imports ?m } GROUP BY ?m
    """)
    assert rows(got, "m", "fs") == [
        ("m:x", "f:a,f:b"), ("m:y", "f:c")]


def test_sum_min_max_over_typed(spark):
    got = sparql(_t(spark), """
        SELECT (SUM(?s) AS ?tot) (MIN(?s + 0) AS ?lo)
        WHERE { ?f k:size ?s }
    """)
    r = got.collect()[0]
    assert (float(r["tot"]), float(r["lo"])) == (49.0, 7.0)


# ----------------------------------------------- term metadata builtins

def test_lang_filter_via_text(spark):
    got = sparql(_t(spark), """
        SELECT ?v WHERE { f:a k:label ?v FILTER(LANG(?v) = "en") }
    """)
    assert rows(got, "v") == [("hello",)]


def test_langmatches_and_isliteral(spark):
    got = sparql(_t(spark), """
        SELECT ?v WHERE { ?s k:label ?v FILTER(LANGMATCHES(LANG(?v), "fr")) }
    """)
    assert rows(got, "v") == [("bonjour",)]
    lits = sparql(_t(spark), """
        SELECT ?v WHERE { f:a ?p ?v FILTER(isLiteral(?v)) }
    """)
    assert rows(lits, "v") == [("42",), ("bonjour",), ("hello",)]


def test_datatype_builtin(spark):
    got = sparql(_t(spark), """
        SELECT ?f WHERE { ?f ?p ?v FILTER(DATATYPE(?v) = "xsd:integer") }
    """)
    assert rows(got, "f") == [("f:a",), ("f:b",)]


def test_isnumeric_builtin(spark):
    # k:size values are xsd:integer literals; labels and IRIs are not
    got = sparql(_t(spark), """
        SELECT ?f ?v WHERE { ?f ?p ?v FILTER(isNumeric(?v)) }
    """)
    assert rows(got, "f", "v") == [("f:a", "42"), ("f:b", "7")]


def test_isiri_excludes_blank(spark):
    t = _t(spark).union(spark.createDataFrame(
        [("f:a", "k:part", "_:b0", True, None, None)], _t(spark).schema))
    got = sparql(t, "SELECT ?v WHERE { f:a ?p ?v FILTER(isIRI(?v)) }")
    assert rows(got, "v") == [("m:x",), ("r:1",)]
    blank = sparql(t, "SELECT ?v WHERE { f:a ?p ?v FILTER(isBlank(?v)) }")
    assert rows(blank, "v") == [("_:b0",)]


def test_bound_over_optional(spark):
    got = sparql(_t(spark), """
        SELECT ?f WHERE { ?f k:imports ?m
            OPTIONAL { ?f k:size ?s } FILTER(!BOUND(?s)) }
    """)
    assert rows(got, "f") == [("f:c",)]


# ---------------------------------------------- ASK / CONSTRUCT / DESCRIBE

def test_ask(spark):
    assert sparql(_t(spark), "ASK { f:a k:imports m:x }").collect()[0].ask
    assert not sparql(_t(spark), "ASK { f:a k:imports m:y }").collect()[0].ask


def test_construct(spark):
    got = sparql(_t(spark), """
        CONSTRUCT { ?m k:usedBy ?f . ?m a k:Used }
        WHERE { ?f k:imports ?m }
    """)
    out = {(r.subj, r.pred, r.obj, r.obj_is_iri) for r in got.collect()}
    assert ("m:x", "k:usedBy", "f:a", True) in out
    assert ("m:x", "rdf:type", "k:Used", True) in out
    assert len(out) == 5  # 3 k:usedBy + 2 k:type


def test_construct_where_shorthand(spark):
    """§16.2.4: CONSTRUCT WHERE { pattern } — the pattern is its own
    template; term metadata of bound objects rides into the output."""
    got = sparql(_t(spark), """
        CONSTRUCT WHERE { ?f k:imports ?m ; k:inRepo r:1 }
    """)
    out = {(r.subj, r.pred, r.obj, r.obj_is_iri) for r in got.collect()}
    assert out == {
        ("f:a", "k:imports", "m:x", True), ("f:a", "k:inRepo", "r:1", True),
        ("f:c", "k:imports", "m:y", True), ("f:c", "k:inRepo", "r:1", True)}
    # literal objects keep their metadata through the echo
    lit = sparql(_t(spark), "CONSTRUCT WHERE { ?f k:size ?v }")
    metas = {(r.obj, r.obj_is_iri, r.obj_datatype) for r in lit.collect()}
    assert metas == {("42", False, "xsd:integer"), ("7", False, "xsd:integer")}
    # dataset clause composes with the shorthand
    with pytest.raises(SparqlSyntaxError):
        sparql(_t(spark), "CONSTRUCT WHERE { ?f k:imports ?m FILTER(true) }")


def test_construct_literal_object_metadata(spark):
    got = sparql(_t(spark), """
        CONSTRUCT { ?f k:note "seen"@en } WHERE { ?f k:inRepo r:1 }
    """)
    r = {(x.subj, x.obj, x.obj_is_iri, x.obj_lang) for x in got.collect()}
    assert r == {("f:a", "seen", False, "en"), ("f:c", "seen", False, "en")}


def test_describe_iri_and_where(spark):
    got = sparql(_t(spark), "DESCRIBE f:a")
    assert got.count() == 5  # every triple with subj f:a
    via = sparql(_t(spark), "DESCRIBE ?m WHERE { ?m k:type k:Module }")
    assert {r.subj for r in via.collect()} == {"m:x", "m:y"}


# --------------------------------------------------------------- errors

def test_agreement_with_programmatic_api(spark):
    t = _t(spark)
    a = sparql(t, """SELECT ?f ?m WHERE {
        ?f k:imports ?m . ?m k:type k:Module . ?f k:inRepo r:1 }""")
    b = match_bgp(t, [("?f", "k:imports", "?m"), ("?m", "k:type", "k:Module"),
                      ("?f", "k:inRepo", "r:1")], project=["f", "m"])
    assert rows(a, "f", "m") == rows(b, "f", "m")


def test_syntax_errors(spark):
    with pytest.raises(SparqlSyntaxError):
        sparql(_t(spark), "SELECT ?f WHERE { ?f k:imports }")
    with pytest.raises(SparqlSyntaxError, match="trailing"):
        sparql(_t(spark), "SELECT ?f WHERE { ?f k:imports ?m } garbage")
    with pytest.raises(SparqlSyntaxError, match="SELECT/ASK"):
        sparql(_t(spark), "INSERT DATA { f:a p o }")


def test_unsupported_forms_raise(spark):
    with pytest.raises(SparqlUnsupportedError, match="WHERE triple"):
        sparql(_t(spark), """CONSTRUCT { ?f k:via [ k:kind k:Dep ] }
                             WHERE { ?f k:imports ?m }""")
    with pytest.raises(SparqlUnsupportedError, match="template"):
        sparql(_t(spark),
               "CONSTRUCT { ?f k:via _:fresh } WHERE { ?f k:imports ?m }")


def test_bnode_property_list(spark):
    """[ p o ] in object position desugars to a fresh joined variable
    (SPARQL §4.1.4); it never appears in SELECT * projections."""
    got = sparql(_t(spark),
                 "SELECT ?f WHERE { ?f k:imports [ k:type k:Module ] }")
    assert rows(got, "f") == [("f:a",), ("f:b",), ("f:c",)]
    # SELECT * does not leak the synthesized variable
    star = sparql(_t(spark),
                  "SELECT * WHERE { ?f k:imports [ k:type k:Module ] }")
    assert star.columns == ["f"]
    # subject-position standalone bracket, with ; inside
    subj = sparql(_t(spark), """SELECT ?m WHERE {
        [ k:imports ?m ; k:inRepo r:1 ] }""")
    assert rows(subj, "m") == [("m:x",), ("m:y",)]
    # nested: files importing a module that depends on something
    nested = sparql(_t(spark), """SELECT ?f WHERE {
        ?f k:imports [ k:dep [ k:dep m:z ] ] }""")
    assert rows(nested, "f") == [("f:a",), ("f:b",)]


LISTS = T + [
    # f:a k:deps (m:x m:y) ; f:b k:deps (m:x) ; f:c k:deps ()
    ("f:a", "k:deps", "_:l1", True, None, None),
    ("_:l1", "rdf:first", "m:x", True, None, None),
    ("_:l1", "rdf:rest", "_:l2", True, None, None),
    ("_:l2", "rdf:first", "m:y", True, None, None),
    ("_:l2", "rdf:rest", "rdf:nil", True, None, None),
    ("f:b", "k:deps", "_:l3", True, None, None),
    ("_:l3", "rdf:first", "m:x", True, None, None),
    ("_:l3", "rdf:rest", "rdf:nil", True, None, None),
    ("f:c", "k:deps", "rdf:nil", True, None, None),
    ("_:l3", "k:tag", "k:t1", True, None, None),
]


def test_rdf_collections_in_patterns(spark):
    """( e1 e2 ) desugars to the rdf:first/rdf:rest spine (SPARQL
    §4.2) — exact-length match, empty list, and subject position."""
    t = spark.createDataFrame(
        LISTS, "subj string, pred string, obj string, "
        "obj_is_iri boolean, obj_datatype string, obj_lang string")
    two = sparql(t, "SELECT ?f WHERE { ?f k:deps ( m:x m:y ) }")
    assert rows(two, "f") == [("f:a",)]
    one = sparql(t, "SELECT ?f WHERE { ?f k:deps ( m:x ) }")
    assert rows(one, "f") == [("f:b",)]
    # () is the plain term rdf:nil
    empty = sparql(t, "SELECT ?f WHERE { ?f k:deps () }")
    assert rows(empty, "f") == [("f:c",)]
    # collection in subject position, element as a variable
    subj = sparql(t, "SELECT ?e WHERE { ( ?e ) k:tag k:t1 }")
    assert rows(subj, "e") == [("m:x",)]
    # spine variables never leak into SELECT *
    star = sparql(t, "SELECT * WHERE { ?f k:deps ( m:x m:y ) }")
    assert star.columns == ["f"]


def test_bnode_label_is_query_variable(spark):
    """SPARQL §4.1.4: a blank-node label in a pattern is a fresh
    non-projectable variable; the same label joins across patterns."""
    got = sparql(_t(spark), "SELECT ?f WHERE { ?f k:imports _:b }")
    assert rows(got, "f") == [("f:a",), ("f:b",), ("f:c",)]
    # same label joins: files importing a TYPED module only
    typed = sparql(_t(spark), """
        SELECT ?f WHERE { ?f k:imports _:m . _:m k:type k:Module }
    """)
    assert rows(typed, "f") == [("f:a",), ("f:b",), ("f:c",)]
    # anonymous [] is fresh per occurrence and never projects
    anon = sparql(_t(spark), "SELECT * WHERE { ?f k:imports [] }")
    assert set(anon.columns) == {"f"}


def test_cartesian_rejected_by_default(spark):
    with pytest.raises(ValueError, match="cartesian"):
        sparql(_t(spark),
               "SELECT ?f ?m WHERE { ?f k:inRepo r:1 . ?m k:type k:Module }")
    got = sparql(_t(spark),
                 "SELECT ?f ?m WHERE { ?f k:inRepo r:1 . ?m k:type k:Module }",
                 allow_cartesian=True)
    assert got.count() == 4


def test_reorder_same_solutions(spark):
    q = """SELECT ?f ?m WHERE {
        ?f k:imports ?m . ?m k:type k:Module . ?f k:inRepo r:1 }"""
    assert rows(sparql(_t(spark), q), "f", "m") == \
        rows(sparql(_t(spark), q, reorder=True), "f", "m")


# ------------------------------------------------------- Update strings

def _rows6(df):
    return sorted(
        (tuple("\0" if v is None else v for v in r) for r in df.collect()))


def test_update_insert_data_existing_wins(spark):
    from rdf_tabular_spark.kg.sparql import sparql_update
    g = _t(spark)
    out = sparql_update(g, """
        INSERT DATA { f:a k:note "fresh"@en . f:a k:size "42" }
    """)
    got = {(r.subj, r.pred, r.obj, r.obj_is_iri, r.obj_datatype,
            r.obj_lang) for r in out.collect()}
    # new triple lands with its literal metadata
    assert ("f:a", "k:note", "fresh", False, None, "en") in got
    # existing (f:a, k:size, 42) keeps its xsd:integer datatype
    assert ("f:a", "k:size", "42", False, "xsd:integer", None) in got
    assert out.count() == len(T) + 1


def test_update_delete_data(spark):
    from rdf_tabular_spark.kg.sparql import sparql_update
    out = sparql_update(_t(spark), """
        DELETE DATA { f:a k:imports m:x . f:z k:absent m:q }
    """)
    assert out.count() == len(T) - 1
    assert not [r for r in out.collect()
                if r.subj == "f:a" and r.pred == "k:imports"]


def test_update_delete_insert_where_rename(spark):
    from rdf_tabular_spark.kg.sparql import sparql_update
    out = sparql_update(_t(spark), """
        DELETE { ?f k:imports ?m } INSERT { ?f k:uses ?m }
        WHERE { ?f k:imports ?m }
    """)
    preds = {r.pred for r in out.collect()}
    assert "k:imports" not in preds and "k:uses" in preds
    assert out.filter("pred = 'k:uses'").count() == 3


def test_update_insert_where_with_filter(spark):
    from rdf_tabular_spark.kg.sparql import sparql_update
    out = sparql_update(_t(spark), """
        INSERT { ?f k:hot "1" } WHERE {
            ?f k:inRepo ?r FILTER(CONTAINS(?r, "1")) }
    """)
    hot = {r.subj for r in out.filter("pred = 'k:hot'").collect()}
    assert hot == {"f:a", "f:c"}
    # template literal objects are literals, not IRIs
    assert all(not r.obj_is_iri
               for r in out.filter("pred = 'k:hot'").collect())


def test_update_delete_where_shorthand_and_sequence(spark):
    from rdf_tabular_spark.kg.sparql import sparql_update
    out = sparql_update(_t(spark), """
        DELETE WHERE { ?f k:label ?v } ;
        INSERT DATA { f:a k:label "only" }
    """)
    labels = [(r.subj, r.obj) for r in
              out.filter("pred = 'k:label'").collect()]
    assert labels == [("f:a", "only")]


def test_update_ground_data_rejects_vars(spark):
    from rdf_tabular_spark.kg.sparql import sparql_update
    with pytest.raises(SparqlSyntaxError, match="ground"):
        sparql_update(_t(spark), "INSERT DATA { ?f k:p o:1 }")


def test_update_where_full_group_grammar(spark):
    # the Update WHERE accepts the full group grammar: OPTIONAL + BOUND
    from rdf_tabular_spark.kg.sparql import sparql_update
    out = sparql_update(_t(spark), """
        INSERT { ?f k:sized "1" } WHERE {
            ?f k:inRepo ?r OPTIONAL { ?f k:size ?s }
            FILTER(BOUND(?s)) }
    """)
    assert {r.subj for r in out.filter("pred = 'k:sized'").collect()} \
        == {"f:a", "f:b"}


def test_update_insert_carries_term_metadata(spark):
    # variable template object: the inserted triple keeps the bound
    # term's literal kind, datatype and language tag
    from rdf_tabular_spark.kg.sparql import sparql_update
    out = sparql_update(_t(spark), """
        DELETE { ?f k:label ?v } INSERT { ?f k:caption ?v }
        WHERE { ?f k:label ?v }
    """)
    caps = {(r.obj, r.obj_is_iri, r.obj_lang) for r in
            out.filter("pred = 'k:caption'").collect()}
    assert caps == {("hello", False, "en"), ("bonjour", False, "fr")}
    assert out.filter("pred = 'k:label'").count() == 0


def test_construct_carries_term_metadata(spark):
    got = sparql(_t(spark), """
        CONSTRUCT { ?f k:caption ?v } WHERE { ?f k:label ?v }
    """)
    caps = {(r.obj, r.obj_is_iri, r.obj_lang) for r in got.collect()}
    assert caps == {("hello", False, "en"), ("bonjour", False, "fr")}

def test_update_delete_where_rejects_rich_groups(spark):
    from rdf_tabular_spark.kg.sparql import sparql_update
    with pytest.raises(SparqlUnsupportedError, match="quad patterns"):
        sparql_update(_t(spark), """
            DELETE WHERE { ?f k:inRepo ?r OPTIONAL { ?f k:size ?s } }
        """)


def test_graph_update_clear_and_move(spark):
    from rdf_tabular_spark.kg.sparql import sparql_graph_update
    q = spark.createDataFrame(
        [("g:1", "s1", "p", "o", True, None, None),
         ("g:2", "s2", "p", "o", True, None, None),
         (None, "s0", "p", "o", True, None, None)],
        "graph string, subj string, pred string, obj string, "
        "obj_is_iri boolean, obj_datatype string, obj_lang string")
    out = sparql_graph_update(q, "CLEAR GRAPH g:1")
    assert {r.graph for r in out.collect()} == {"g:2", None}
    moved = sparql_graph_update(q, "MOVE GRAPH g:2 TO DEFAULT")
    got = {(r.graph, r.subj) for r in moved.collect()}
    assert got == {("g:1", "s1"), (None, "s2")}
    seq = sparql_graph_update(q, "CLEAR GRAPH g:1 ; CLEAR GRAPH g:2")
    assert {r.graph for r in seq.collect()} == {None}
    # NAMED: every named graph goes, the default graph survives
    named = sparql_graph_update(q, "DROP NAMED")
    assert {(r.graph, r.subj) for r in named.collect()} == {(None, "s0")}
    allg = sparql_graph_update(q, "CLEAR SILENT ALL")
    assert allg.count() == 0


# ------------------------------------------------------- GRAPH / dataset

def _quads(spark):
    """T with file-scoped triples in per-repo named graphs, the module/
    repo metadata in the default graph (the kg/dataset.py model)."""
    from rdf_tabular_spark.kg.dataset import with_graph

    return with_graph(_t(spark), """
        CASE WHEN subj LIKE 'f:%' THEN
          CASE WHEN subj = 'f:b' THEN 'g:r2' ELSE 'g:r1' END
        ELSE NULL END""")


def test_graph_variable_binds_and_joins_default(spark):
    got = sparql(_quads(spark), """
        SELECT ?g ?f ?m WHERE {
          GRAPH ?g { ?f k:imports ?m }
          ?m k:type k:Module
        }""")
    assert rows(got, "g", "f", "m") == [
        ("g:r1", "f:a", "m:x"), ("g:r1", "f:c", "m:y"),
        ("g:r2", "f:b", "m:x")]


def test_graph_constant_scopes_patterns(spark):
    got = sparql(_quads(spark), """
        SELECT ?f ?m WHERE { GRAPH <g:r2> { ?f k:imports ?m } }""")
    assert rows(got, "f", "m") == [("f:b", "m:x")]


def test_graph_variable_scoping_within_group(spark):
    # both patterns inside one GRAPH ?g must match in the SAME graph:
    # imports and inRepo are graph-scoped together, so only same-graph
    # combinations survive
    got = sparql(_quads(spark), """
        SELECT ?g ?f ?r WHERE {
          GRAPH ?g { ?f k:imports ?m . ?f k:inRepo ?r }
        }""")
    assert rows(got, "g", "f", "r") == [
        ("g:r1", "f:a", "r:1"), ("g:r1", "f:c", "r:1"),
        ("g:r2", "f:b", "r:2")]


def test_default_graph_excludes_named(spark):
    # bare patterns over a quad table see the DEFAULT graph only
    got = sparql(_quads(spark), "SELECT ?s WHERE { ?s k:imports ?m }")
    assert got.count() == 0
    got = sparql(_quads(spark), "SELECT ?m WHERE { ?m k:type k:Module }")
    assert rows(got, "m") == [("m:x",), ("m:y",)]


def test_graph_constant_allows_paths_and_meta(spark):
    # constant scope = filtered triple table: full algebra inside
    got = sparql(_quads(spark), """
        SELECT ?f ?r WHERE { GRAPH <g:r1> { ?f k:inRepo ?r .
                             FILTER(STRSTARTS(STR(?r), "r:")) } }""")
    assert rows(got, "f", "r") == [("f:a", "r:1"), ("f:c", "r:1")]


def test_graph_filter_inside_variable_scope(spark):
    got = sparql(_quads(spark), """
        SELECT ?g ?f WHERE {
          GRAPH ?g { ?f k:imports ?m . FILTER(?m = "m:x") }
        }""")
    assert rows(got, "g", "f") == [("g:r1", "f:a"), ("g:r2", "f:b")]


def test_graph_over_triple_table_raises(spark):
    with pytest.raises(SparqlUnsupportedError, match="quad table"):
        sparql(_t(spark), "SELECT ?f WHERE { GRAPH ?g { ?f k:imports ?m } }")


def test_graph_meta_inside_variable_scope_raises(spark):
    with pytest.raises(SparqlUnsupportedError, match="term-metadata"):
        sparql(_quads(spark), """
            SELECT ?g ?f WHERE {
              GRAPH ?g { ?f k:label ?l . FILTER(LANG(?l) = "en") }
            }""")


def test_graph_same_var_across_clauses(spark):
    # the same ?g in two GRAPH clauses forces the same graph
    got = sparql(_quads(spark), """
        SELECT ?g ?f1 ?f2 WHERE {
          GRAPH ?g { ?f1 k:imports m:x }
          GRAPH ?g { ?f2 k:imports m:y }
        }""")
    assert rows(got, "g", "f1", "f2") == [("g:r1", "f:a", "f:c")]


def test_from_replaces_default_graph(spark):
    # FROM <g:r2>: the named graph becomes THE default graph; bare
    # patterns now see it, and the old default (module metadata) is gone
    got = sparql(_quads(spark), """
        SELECT ?f ?m FROM <g:r2> WHERE { ?f k:imports ?m }""")
    assert rows(got, "f", "m") == [("f:b", "m:x")]
    got = sparql(_quads(spark), """
        SELECT ?m FROM <g:r2> WHERE { ?m k:type k:Module }""")
    assert got.count() == 0


def test_from_merges_multiple_graphs(spark):
    got = sparql(_quads(spark), """
        SELECT ?f FROM <g:r1> FROM <g:r2> WHERE { ?f k:imports ?m }""")
    assert rows(got, "f") == [("f:a",), ("f:b",), ("f:c",)]


def test_from_named_restricts_graph_clause(spark):
    got = sparql(_quads(spark), """
        SELECT ?g ?f FROM NAMED <g:r1> WHERE {
          GRAPH ?g { ?f k:imports ?m } }""")
    assert rows(got, "g", "f") == [("g:r1", "f:a"), ("g:r1", "f:c")]
    # without FROM NAMED in the clause set, GRAPH ranges over nothing
    got = sparql(_quads(spark), """
        SELECT ?g ?f FROM <g:r1> WHERE {
          GRAPH ?g { ?f k:imports ?m } }""")
    assert got.count() == 0


def test_from_ask_and_construct(spark):
    got = sparql(_quads(spark), "ASK FROM <g:r2> { f:b k:imports m:x }")
    assert got.collect()[0]["ask"] is True
    got = sparql(_quads(spark), """
        CONSTRUCT { ?f k:in ?m } FROM <g:r1> WHERE { ?f k:imports ?m }""")
    assert rows(got, "subj", "obj") == [("f:a", "m:x"), ("f:c", "m:y")]


def test_from_on_triple_table_raises(spark):
    with pytest.raises(SparqlUnsupportedError, match="quad table"):
        sparql(_t(spark), "SELECT ?f FROM <g:r1> WHERE { ?f k:imports ?m }")


def test_from_in_subselect_raises(spark):
    with pytest.raises(SparqlSyntaxError, match="sub-SELECT"):
        sparql(_quads(spark), """
            SELECT ?f WHERE {
              { SELECT ?f FROM <g:r1> WHERE { ?f k:imports ?m } } }""")


def test_describe_with_from(spark):
    # DESCRIBE over a quad table: FROM picks the graph whose facts
    # describe the resource; without it the default graph describes
    got = sparql(_quads(spark), "DESCRIBE <f:b> FROM <g:r2>")
    assert rows(got, "subj", "pred", "obj") == [
        ("f:b", "k:imports", "m:x"), ("f:b", "k:inRepo", "r:2"),
        ("f:b", "k:size", "7")]
    # default graph has no f:b facts
    assert sparql(_quads(spark), "DESCRIBE <f:b>").count() == 0
    # DESCRIBE ?var WHERE over the dataset: GRAPH scope finds the var,
    # the description draws from the FROM default graph
    got = sparql(_quads(spark), """
        DESCRIBE ?f FROM <g:r1> WHERE { ?f k:inRepo r:1 }""")
    assert sorted({r["subj"] for r in got.collect()}) == ["f:a", "f:c"]


def test_construct_with_modifiers(spark):
    # top-2 files by IRI: modifiers bind to the WHERE solutions before
    # template instantiation (spec §16.2)
    got = sparql(_t(spark), """
        CONSTRUCT { ?f k:seen "y" } WHERE { ?f k:imports ?m }
        ORDER BY ?f LIMIT 2""")
    assert rows(got, "subj") == [("f:a",), ("f:b",)]
    got = sparql(_t(spark), """
        CONSTRUCT { ?f k:seen "y" } WHERE { ?f k:imports ?m }
        ORDER BY DESC(?f) LIMIT 1 OFFSET 1""")
    assert rows(got, "subj") == [("f:b",)]


def test_reorder_stats_same_solutions(spark):
    q = """SELECT ?f ?m ?r WHERE {
          ?f k:imports ?m . ?f k:inRepo ?r }"""
    plain = rows(sparql(_t(spark), q), "f", "m", "r")
    stats = rows(sparql(_t(spark), q, reorder="stats"), "f", "m", "r")
    assert plain == stats and plain


def test_expression_aggregate(spark):
    """r5: aggregates take full expression arguments — SUM(?x * ?y),
    AVG(?a + 1) — with operands coerced into double's value space."""
    out = sparql(_t(spark), """
        SELECT (SUM(?s * ?s) AS ?ssq) (AVG(?s + 1) AS ?m)
        WHERE { ?f <k:size> ?s }
    """).collect()[0]
    assert out["ssq"] == 42.0 * 42 + 7 * 7
    assert out["m"] == ((42 + 1) + (7 + 1)) / 2


def test_count_distinct_star_counts_solutions(spark):
    """r5: COUNT(DISTINCT *) counts distinct SOLUTIONS over the
    in-scope variables (the r4 compiler folded it to a constant)."""
    # ?f <k:imports> ?m has 3 distinct (f, m) solutions
    out = sparql(_t(spark), """
        SELECT (COUNT(DISTINCT *) AS ?n) WHERE { ?f <k:imports> ?m }
    """).collect()[0]
    assert out["n"] == 3
    # grouped: distinct (f) per module
    got = rows(sparql(_t(spark), """
        SELECT ?m (COUNT(DISTINCT *) AS ?n)
        WHERE { ?f <k:imports> ?m } GROUP BY ?m
    """), "m", "n")
    assert got == [("m:x", 2), ("m:y", 1)]


def test_arithmetic_in_filter_still_works(spark):
    got = rows(sparql(_t(spark), """
        SELECT ?f WHERE { ?f <k:size> ?s . FILTER(?s * 2 > 20) }
    """), "f")
    assert got == [("f:a",)]
