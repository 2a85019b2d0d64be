"""OWL-RL-lite property rules (kg/owl.py): inverse/symmetric/transitive/
chain closure + functional-property sameAs pairs."""

import warnings

from pyspark.sql import functions as F

from rdf_tabular_spark.kg.owl import (
    FUNCTIONAL,
    INVERSE_FUNCTIONAL,
    INVERSE_OF,
    SYMMETRIC,
    TRANSITIVE,
    functional_sameas,
    owl_property_materialize,
    parse_axioms,
)

SCHEMA = ("subj string, pred string, obj string, obj_is_iri boolean, "
          "obj_datatype string, obj_lang string")
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _t(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _spo(df):
    return {(r["subj"], r["pred"], r["obj"]) for r in df.collect()}


def test_inverse_and_symmetric(spark):
    t = _t(spark, [
        ("e:f", "e:defines", "e:s", True, None, None),
        ("e:a", "e:near", "e:b", True, None, None),
        ("e:f", "e:defines", "lit", False, None, None),  # literal: skipped
    ])
    out = owl_property_materialize(
        t, inverse=[("e:defines", "e:definedIn")], symmetric=["e:near"])
    got = _spo(out)
    assert ("e:s", "e:definedIn", "e:f") in got
    assert ("e:b", "e:near", "e:a") in got
    assert not any(s == "lit" for s, _, _ in got)
    # asserted rows intact
    assert ("e:f", "e:defines", "lit") in got


def test_transitive_closure_log_doubling(spark):
    # an 8-chain closes within ~log2(8)+1 frontier rounds
    rows = [(f"e:n{i}", "e:dep", f"e:n{i+1}", True, None, None)
            for i in range(8)]
    out = owl_property_materialize(_t(spark, rows), transitive=["e:dep"],
                                   max_rounds=5)
    got = _spo(out)
    assert ("e:n0", "e:dep", "e:n8") in got
    assert len([g for g in got if g[1] == "e:dep"]) == 9 * 8 // 2


def test_cycle_terminates(spark):
    rows = [("e:a", "e:dep", "e:b", True, None, None),
            ("e:b", "e:dep", "e:c", True, None, None),
            ("e:c", "e:dep", "e:a", True, None, None)]
    out = owl_property_materialize(_t(spark, rows), transitive=["e:dep"])
    assert len(_spo(out)) == 9  # complete digraph incl. self-loops


def test_chain_composes_with_inverse(spark):
    # definedIn (inverse-derived) ∘ inRepo ⊑ inRepo: symbols gain repo
    # membership only through the rule pipeline's own output
    t = _t(spark, [
        ("e:f", "e:defines", "e:s", True, None, None),
        ("e:f", "e:inRepo", "e:r", True, None, None),
    ])
    out = owl_property_materialize(
        t, inverse=[("e:defines", "e:definedIn")],
        chains=[("e:definedIn", "e:f_inRepo_wrong", "e:never"),
                ("e:definedIn", "e:inRepo", "e:inRepo")])
    assert ("e:s", "e:inRepo", "e:r") in _spo(out)
    assert not any(p == "e:never" for _, p, _ in _spo(out))


def test_chain_carries_second_premise_metadata(spark):
    t = _t(spark, [
        ("e:a", "e:p1", "e:b", True, None, None),
        ("e:b", "e:p2", "42", False, "xsd:int", None),
    ])
    out = owl_property_materialize(t, chains=[("e:p1", "e:p2", "e:q")])
    [r] = out.filter(F.col("pred") == "e:q").collect()
    assert (r["obj"], r["obj_is_iri"], r["obj_datatype"]) == (
        "42", False, "xsd:int")


def test_non_fixpoint_warns(spark):
    rows = [(f"e:n{i}", "e:dep", f"e:n{i+1}", True, None, None)
            for i in range(40)]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        owl_property_materialize(_t(spark, rows), transitive=["e:dep"],
                                 max_rounds=2).count()
    assert any("fixpoint" in str(x.message) for x in w)


def test_axioms_from_ontology_triples(spark):
    onto = spark.createDataFrame([
        ("e:defines", INVERSE_OF, "e:definedIn"),
        ("e:near", RDF_TYPE, SYMMETRIC),
        ("e:dep", RDF_TYPE, TRANSITIVE),
        ("e:sha", RDF_TYPE, INVERSE_FUNCTIONAL),
        ("e:home", RDF_TYPE, FUNCTIONAL),
    ], "subj string, pred string, obj string")
    ax = parse_axioms(onto)
    assert ax == {"inverse": [("e:defines", "e:definedIn")],
                  "symmetric": ["e:near"], "transitive": ["e:dep"],
                  "functional": ["e:home"],
                  "inverse_functional": ["e:sha"]}
    t = _t(spark, [("e:a", "e:dep", "e:b", True, None, None),
                   ("e:b", "e:dep", "e:c", True, None, None)])
    assert ("e:a", "e:dep", "e:c") in _spo(
        owl_property_materialize(t, ontology=onto))


def test_functional_sameas_pairs(spark):
    t = _t(spark, [
        # e:home functional: x maps to two homes -> homes are sameAs
        ("e:x", "e:home", "e:h2", True, None, None),
        ("e:x", "e:home", "e:h1", True, None, None),
        # e:sha inverse-functional: two subjects share a sha object
        ("e:d2", "e:sha", "e:k", True, None, None),
        ("e:d1", "e:sha", "e:k", True, None, None),
        ("e:d3", "e:other", "e:k", True, None, None),  # not an axiom pred
    ])
    got = {(r["a"], r["b"]) for r in functional_sameas(
        t, functional=["e:home"], inverse_functional=["e:sha"]).collect()}
    assert got == {("e:h2", "e:h1"), ("e:d2", "e:d1")}


def test_functional_sameas_feeds_smush(spark):
    from rdf_tabular_spark.kg.smush import smush

    t = _t(spark, [
        ("e:d2", "e:sha", "e:k", True, None, None),
        ("e:d1", "e:sha", "e:k", True, None, None),
        ("e:d2", "e:p", "v", False, None, None),
    ])
    pairs = functional_sameas(t, inverse_functional=["e:sha"])
    out = smush(t, pairs=pairs)
    assert ("e:d1", "e:p", "v") in _spo(out)
    assert not any(s == "e:d2" for s, _, _ in _spo(out))


def test_incremental_equals_full_recompute(spark):
    """Close a base graph, add a delta that extends a transitive chain
    AND triggers the chain rule through an inverse — the incremental
    path must produce exactly the from-scratch closure of the union."""
    rules = dict(inverse=[("e:defines", "e:definedIn")],
                 transitive=["e:dep"],
                 chains=[("e:definedIn", "e:inRepo", "e:inRepo")])
    base_rows = [
        ("e:a", "e:dep", "e:b", True, None, None),
        ("e:b", "e:dep", "e:c", True, None, None),
        ("e:f", "e:inRepo", "e:r", True, None, None),
    ]
    delta_rows = [
        ("e:c", "e:dep", "e:d", True, None, None),   # extends the chain
        ("e:f", "e:defines", "e:s", True, None, None),  # inverse→chain
    ]
    base = _t(spark, base_rows)
    delta = _t(spark, delta_rows)
    from rdf_tabular_spark.kg.owl import owl_incremental

    mat = owl_property_materialize(base, **rules)
    inc = owl_incremental(mat, delta, **rules)
    full = owl_property_materialize(_t(spark, base_rows + delta_rows),
                                    **rules)
    assert _spo(inc) == _spo(full)
    # the delta's consequences really fired
    assert ("e:a", "e:dep", "e:d") in _spo(inc)
    assert ("e:s", "e:inRepo", "e:r") in _spo(inc)


def test_incremental_noop_delta(spark):
    rules = dict(transitive=["e:dep"])
    base = _t(spark, [("e:a", "e:dep", "e:b", True, None, None)])
    mat = owl_property_materialize(base, **rules)
    from rdf_tabular_spark.kg.owl import owl_incremental

    # delta already present: nothing changes
    inc = owl_incremental(mat, base, **rules)
    assert _spo(inc) == _spo(mat)
