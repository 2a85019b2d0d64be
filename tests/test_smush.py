"""owl:sameAs smushing (kg/smush.py): closure, canonical election,
graph rewrite, term-identity set semantics."""

from pyspark.sql import functions as F

from rdf_tabular_spark.kg.smush import (
    OWL_SAMEAS,
    sameas_closure,
    sameas_from_shared_key,
    sameas_pairs,
    smush,
)

SCHEMA = ("subj string, pred string, obj string, obj_is_iri boolean, "
          "obj_datatype string, obj_lang string")


def _t(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_closure_is_transitive_and_symmetric(spark):
    # chain a-b, b-c plus a reversed link d<-c: one class, min = a
    pairs = spark.createDataFrame(
        [("e:b", "e:a"), ("e:b", "e:c"), ("e:d", "e:c")], "a string, b string")
    got = {(r["iri"], r["canonical"]) for r in sameas_closure(pairs).collect()}
    assert got == {("e:a", "e:a"), ("e:b", "e:a"),
                   ("e:c", "e:a"), ("e:d", "e:a")}


def test_smush_rewrites_both_positions_and_drops_sameas(spark):
    triples = _t(spark, [
        ("e:b", OWL_SAMEAS, "e:a", True, None, None),
        ("e:b", "e:p", "x", False, None, None),          # subj rewrite
        ("e:z", "e:q", "e:b", True, None, None),          # obj rewrite
        ("e:z", "e:q", "e:b", False, None, None),         # literal "e:b": kept
        ("e:u", "e:r", "e:v", True, None, None),          # untouched
    ])
    assert _rows(smush(triples)) == [
        ("e:a", "e:p", "x", False, None, None),
        ("e:u", "e:r", "e:v", True, None, None),
        ("e:z", "e:q", "e:a", True, None, None),
        ("e:z", "e:q", "e:b", False, None, None),
    ]


def test_smush_set_semantics_on_collision(spark):
    # both aliases assert the same fact -> one row after rewrite
    triples = _t(spark, [
        ("e:b", OWL_SAMEAS, "e:a", True, None, None),
        ("e:a", "e:p", "v", False, None, None),
        ("e:b", "e:p", "v", False, None, None),
    ])
    assert _rows(smush(triples)) == [("e:a", "e:p", "v", False, None, None)]


def test_term_identity_keeps_datatype_distinct_rows(spark):
    # same object STRING, different datatype: distinct RDF terms, kept
    triples = _t(spark, [
        ("e:b", OWL_SAMEAS, "e:a", True, None, None),
        ("e:a", "e:p", "42", False, "xsd:integer", None),
        ("e:b", "e:p", "42", False, "xsd:decimal", None),
    ])
    assert len(_rows(smush(triples))) == 2


def test_keep_sameas_rewritten(spark):
    triples = _t(spark, [
        ("e:b", OWL_SAMEAS, "e:a", True, None, None),
        ("e:b", "e:p", "x", False, None, None),
    ])
    out = smush(triples, drop_sameas=False)
    # the sameAs link itself collapses to a canonical self-loop
    assert ("e:a", OWL_SAMEAS, "e:a", True, None, None) in _rows(out)


def test_sameas_from_shared_key(spark):
    triples = _t(spark, [
        ("e:s2", "e:name", "foo", False, None, None),
        ("e:s1", "e:name", "foo", False, None, None),
        ("e:s3", "e:name", "bar", False, None, None),
        ("e:s4", "e:name", "e:s1", True, None, None),   # IRI obj: ignored
    ])
    pairs = {(r["a"], r["b"])
             for r in sameas_from_shared_key(triples, "e:name").collect()}
    assert pairs == {("e:s2", "e:s1")}


def test_asserted_pairs_extraction(spark):
    triples = _t(spark, [
        ("e:b", OWL_SAMEAS, "e:a", True, None, None),
        ("e:b", OWL_SAMEAS, "e:b", True, None, None),   # self-loop dropped
        ("e:b", OWL_SAMEAS, "lit", False, None, None),  # literal dropped
        ("e:b", "e:p", "e:a", True, None, None),
    ])
    assert _rows(sameas_pairs(triples)) == [("e:b", "e:a")]


def test_smush_idempotent_and_layout_invariant(spark):
    triples = _t(spark, [
        ("e:c", OWL_SAMEAS, "e:b", True, None, None),
        ("e:b", OWL_SAMEAS, "e:a", True, None, None),
        ("e:c", "e:p", "e:c", True, None, None),
        ("e:x", "e:q", "e:y", True, None, None),
    ]).repartition(7)
    once = smush(triples)
    assert _rows(smush(once)) == _rows(once) == [
        ("e:a", "e:p", "e:a", True, None, None),
        ("e:x", "e:q", "e:y", True, None, None),
    ]


def test_untouched_stream_has_no_exchange(spark):
    """The scale contract: with a broadcast mapping, the untouched
    branch of the plan must not shuffle (only the rewritten subset
    pays the dedup exchange)."""
    triples = _t(spark, [
        ("e:b", OWL_SAMEAS, "e:a", True, None, None),
        ("e:b", "e:p", "x", False, None, None),
        ("e:u", "e:r", "e:v", True, None, None),
    ])
    mapping = spark.createDataFrame(
        [("e:b", "e:a"), ("e:a", "e:a")], "iri string, canonical string")
    plan = smush(triples, mapping=mapping)._jdf.queryExecution().toString()
    # exactly one aggregate-style exchange (the rewritten-side dedup);
    # broadcast exchanges don't count
    import re
    shuffles = [ln for ln in plan.splitlines()
                if re.search(r"Exchange (hash|range)partitioning", ln)]
    assert len(shuffles) <= 1, plan


def test_hot_key_pairs_stay_linear(spark):
    """Adversarial hot name: 2,000 symbols share one kg:name literal.
    Key-collision blocking must emit O(n) star pairs (alias->min), not
    O(n^2) — the scale contract of sameas_from_shared_key."""
    rows = [(f"e:s{i:05d}", "e:name", "hot", False, None, None)
            for i in range(2000)]
    rows += [(f"e:s{i:05d}", "e:p", f"v{i}", False, None, None)
             for i in range(2000)]
    t = _t(spark, rows)
    pairs = sameas_from_shared_key(t, "e:name")
    assert pairs.count() == 1999  # n-1 star edges, not C(n,2)
    out = smush(t, pairs=pairs)
    # all facts collapse onto the min symbol
    assert out.filter(F.col("subj") == "e:s00000").count() == 2001
    assert out.count() == 2001
