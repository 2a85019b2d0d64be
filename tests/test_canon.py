"""Distributed RDF canonicalization (kg/canon.py).

Contract (matches the rdf-isomorphic gem the reference's specs lean on,
reference spec/reader_spec.rb usage of be_equivalent_graphs):
canonical labels are invariant under any bnode relabeling of an
isomorphic graph, and differ for non-isomorphic graphs that agree on
everything except structure.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_tabular_spark.kg import canon


def _triples(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, iri,
          None if iri else dt, None)
         for s, p, o, iri, dt in rows],
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, obj_lang string")


def _canon_set(df):
    return {(r.subj, r.pred, r.obj, r.obj_is_iri, r.obj_datatype, r.obj_lang)
            for r in df.collect()}


ROWS = [
    # two bnode "rows" hanging off a table bnode, each with a literal
    ("_:t", "http://e/hasRow", "_:r1", True, None),
    ("_:t", "http://e/hasRow", "_:r2", True, None),
    ("_:r1", "http://e/name", "alice", False, "http://www.w3.org/2001/XMLSchema#string"),
    ("_:r2", "http://e/name", "bob", False, "http://www.w3.org/2001/XMLSchema#string"),
    ("_:r1", "http://e/next", "_:r2", True, None),
    ("http://e/g", "http://e/table", "_:t", True, None),
]

RENAME = {"_:t": "_:zz9", "_:r1": "_:k", "_:r2": "_:a0"}


def _relabel(rows):
    out = []
    for s, p, o, iri, dt in rows:
        out.append((RENAME.get(s, s), p,
                    RENAME.get(o, o) if iri else o, iri, dt))
    return out


def test_isomorphic_graphs_canonicalize_identically(spark):
    a = canon.canonicalize(_triples(spark, ROWS))
    b = canon.canonicalize(_triples(spark, _relabel(ROWS)))
    assert _canon_set(a) == _canon_set(b)
    # and the canonical graph has the same shape/size as the input
    assert a.count() == len(ROWS)


def test_distinguishable_nodes_get_distinct_labels(spark):
    labels = canon.canonical_labels(_triples(spark, ROWS))
    got = {r.node: (r.canon, r.orbit_size) for r in labels.collect()}
    assert set(got) == {"_:t", "_:r1", "_:r2"}
    # alice-row vs bob-row vs table: all distinguished by content
    canons = {c for c, _ in got.values()}
    assert len(canons) == 3
    assert all(n == 1 for _, n in got.values())
    assert all(c.startswith("_:c") for c in canons)


def test_non_isomorphic_graphs_differ(spark):
    # same triple COUNT and predicate multiset, different wiring:
    # swap which row carries the 'next' pointer's direction
    alt = [r for r in ROWS if r[1] != "http://e/next"]
    alt.append(("_:r2", "http://e/next", "_:r1", True, None))
    a = canon.canonicalize(_triples(spark, ROWS))
    b = canon.canonicalize(_triples(spark, alt))
    assert _canon_set(a) != _canon_set(b)


def test_automorphic_orbit_reported_not_hidden(spark):
    # two structurally identical rows -> one color class of size 2,
    # disambiguated deterministically, orbit_size observable
    sym = [
        ("_:t", "http://e/hasRow", "_:r1", True, None),
        ("_:t", "http://e/hasRow", "_:r2", True, None),
        ("_:r1", "http://e/v", "x", False, None),
        ("_:r2", "http://e/v", "x", False, None),
    ]
    labels = canon.canonical_labels(_triples(spark, sym))
    got = {r.node: (r.canon, r.orbit_size) for r in labels.collect()}
    assert got["_:r1"][1] == 2 and got["_:r2"][1] == 2
    assert got["_:r1"][0] != got["_:r2"][0]          # still unique labels
    assert got["_:r1"][0].rsplit("-", 1)[0] == \
        got["_:r2"][0].rsplit("-", 1)[0]             # same color stem
    # relabeling within the orbit yields the SAME canonical triple set
    ren = {"_:r1": "_:b", "_:r2": "_:y"}
    sym2 = [(ren.get(s, s), p, ren.get(o, o) if i else o, i, d)
            for s, p, o, i, d in sym]
    assert _canon_set(canon.canonicalize(_triples(spark, sym))) == \
        _canon_set(canon.canonicalize(_triples(spark, sym2)))


def test_ground_terms_flow_through_untouched(spark):
    out = canon.canonicalize(_triples(spark, ROWS))
    grounds = {r.obj for r in out.filter(~F.col("obj").startswith("_:"))
               .collect()}
    assert {"alice", "bob"} <= grounds
    subj_iris = {r.subj for r in out.filter(~F.col("subj").startswith("_:"))
                 .collect()}
    assert subj_iris == {"http://e/g"}


def test_literal_identity_distinguishes(spark):
    # same lexical form, different datatype => rows must NOT fall into
    # one orbit
    rows = [
        ("_:a", "http://e/v", "42", False,
         "http://www.w3.org/2001/XMLSchema#integer"),
        ("_:b", "http://e/v", "42", False,
         "http://www.w3.org/2001/XMLSchema#string"),
    ]
    labels = canon.canonical_labels(_triples(spark, rows))
    got = {r.node: r.canon for r in labels.collect()}
    assert got["_:a"] != got["_:b"]
    assert all("-" not in c[3:] for c in got.values())  # no orbit suffix


def test_exact_rounds_pins_colors(spark):
    a = canon.canonical_labels(_triples(spark, ROWS), exact_rounds=3)
    b = canon.canonical_labels(_triples(spark, _relabel(ROWS)),
                               exact_rounds=3)
    ca = {r.canon for r in a.collect()}
    cb = {r.canon for r in b.collect()}
    assert ca == cb


def test_canonical_diff_of_renaming_is_empty(spark):
    a = _triples(spark, ROWS)
    b = _triples(spark, _relabel(ROWS))
    assert canon.canonical_diff(a, b).count() == 0
    # whereas the raw-label diff would see every renamed triple
    from rdf_tabular_spark.kg.delta import graph_diff
    assert graph_diff(a, b).count() > 0


def test_canonical_diff_reports_real_changes(spark):
    star = [
        ("_:n1", "http://e/name", "a", False, None),
        ("_:n1", "http://e/mark", "_:m1", True, None),
        ("_:m1", "http://e/kind", "m", False, None),
        ("_:n2", "http://e/name", "b", False, None),
        ("_:n2", "http://e/mark", "_:m2", True, None),
        ("_:m2", "http://e/kind", "m", False, None),
    ]
    # rename bnodes AND change one star's literal
    ren = {"_:n1": "_:x", "_:m1": "_:y", "_:n2": "_:p", "_:m2": "_:q"}
    pert = [(ren[s], p,
             ("a!" if o == "a" else o) if not i else ren[o], i, d)
            for s, p, o, i, d in star]
    diff = canon.canonical_diff(_triples(spark, star),
                                _triples(spark, pert))
    rows = [(r.change, r.pred, r.obj) for r in diff.collect()]
    # only star 1 is affected; star 2 survives the renaming untouched
    assert len(rows) == 6
    assert ("removed", "http://e/name", "a") in rows
    assert ("added", "http://e/name", "a!") in rows
    kinds = sorted(r[0] for r in rows if r[1] == "http://e/kind")
    assert kinds == ["added", "removed"]  # m1 relabeled, both sides


def test_canonical_diff_term_identity(spark):
    a = [("_:n", "http://e/v", "42", False,
          "http://www.w3.org/2001/XMLSchema#integer")]
    b = [("_:n", "http://e/v", "42", False,
          "http://www.w3.org/2001/XMLSchema#string")]
    diff = canon.canonical_diff(_triples2(spark, a), _triples2(spark, b))
    assert diff.count() == 2  # datatype change is a remove+add


def _triples2(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, iri, dt, None) for s, p, o, iri, dt in rows],
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, obj_lang string")


def test_fingerprint_invariant_under_renaming(spark):
    fa = canon.graph_fingerprint(_triples(spark, ROWS)).first()
    fb = canon.graph_fingerprint(_triples(spark, _relabel(ROWS))).first()
    assert fa.n_triples == fb.n_triples == len(ROWS)
    assert fa.fingerprint == fb.fingerprint


def test_fingerprint_detects_structural_change(spark):
    alt = [r for r in ROWS if r[1] != "http://e/next"]
    alt.append(("_:r2", "http://e/next", "_:r1", True, None))
    fa = canon.graph_fingerprint(_triples(spark, ROWS)).first()
    fb = canon.graph_fingerprint(_triples(spark, alt)).first()
    assert fa.n_triples == fb.n_triples       # same size...
    assert fa.fingerprint != fb.fingerprint   # ...different wiring


def test_fingerprint_set_semantics(spark):
    dup = _triples(spark, ROWS + ROWS[:2])
    fa = canon.graph_fingerprint(_triples(spark, ROWS)).first()
    fb = canon.graph_fingerprint(dup).first()
    assert (fa.n_triples, fa.fingerprint) == (fb.n_triples,
                                              fb.fingerprint)


def test_canonical_ntriples_byte_identical(spark):
    a = [r.line for r in canon.canonical_ntriples(
        _triples(spark, ROWS)).collect()]
    b = [r.line for r in canon.canonical_ntriples(
        _triples(spark, _relabel(ROWS)).repartition(7)).collect()]
    assert a == b                      # same bytes, same order
    assert a == sorted(a)              # total order
    assert len(a) == len(ROWS)
    assert all(ln.endswith(" .") for ln in a)
    # every bnode is a canonical label
    assert all(tok.startswith("_:c") for ln in a
               for tok in ln.split() if tok.startswith("_:"))


def test_csvw_envelope_roundtrip_isomorphic(spark):
    """Real CSVW standard-mode output: canonicalizing twice is a no-op
    on the already-canonical graph (idempotence on the relabeled set)."""
    sym = [("_:d", "http://e/p", "_:e", True, None),
           ("_:e", "http://e/q", "lit", False, None)]
    once = canon.canonicalize(_triples(spark, sym))
    twice = canon.canonicalize(once)
    assert _canon_set(once) == _canon_set(twice)
