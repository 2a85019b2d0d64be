"""BGP matching (kg/query.py) over a hand triple set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_tabular_spark.kg.query import match_bgp

T = [
    ("f:a", "imports", "m:x"),
    ("f:a", "inRepo", "r:1"),
    ("f:b", "imports", "m:x"),
    ("f:b", "inRepo", "r:2"),
    ("f:c", "imports", "m:y"),
    ("f:c", "inRepo", "r:1"),
    ("m:x", "type", "Module"),
    ("m:y", "type", "Module"),
    ("f:loop", "imports", "f:loop"),
]


def _triples(spark):
    return spark.createDataFrame(
        [(s, p, o, True, None, None) for s, p, o in T],
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, obj_lang string")


def test_single_pattern(spark):
    got = {(r["f"], r["m"]) for r in match_bgp(
        _triples(spark), [("?f", "imports", "?m")]).collect()}
    assert got == {("f:a", "m:x"), ("f:b", "m:x"), ("f:c", "m:y"),
                   ("f:loop", "f:loop")}


def test_conjunction_joins_on_shared_vars(spark):
    rows = match_bgp(_triples(spark), [
        ("?f", "imports", "?m"),
        ("?m", "type", "Module"),
        ("?f", "inRepo", "r:1"),
    ], project=["f", "m"]).collect()
    assert {(r["f"], r["m"]) for r in rows} == {
        ("f:a", "m:x"), ("f:c", "m:y")}


def test_repeated_var_within_pattern(spark):
    rows = match_bgp(_triples(spark), [("?x", "imports", "?x")]).collect()
    assert [r["x"] for r in rows] == ["f:loop"]


def test_projection_distinct(spark):
    # repos with at least one importing file: f:a and f:c both in r:1
    rows = match_bgp(_triples(spark), [
        ("?f", "imports", "?m"),
        ("?f", "inRepo", "?r"),
    ], project=["r"]).collect()
    assert sorted(r["r"] for r in rows) == ["r:1", "r:2"]


def test_cartesian_rejected(spark):
    with pytest.raises(ValueError, match="cartesian"):
        match_bgp(_triples(spark), [
            ("?f", "imports", "?m"), ("?g", "type", "Module")])
    n = match_bgp(_triples(spark), [
        ("?f", "inRepo", "r:2"), ("?g", "type", "Module")],
        allow_cartesian=True).count()
    assert n == 2  # 1 file x 2 modules


def test_optional_left_join(spark):
    extra = _triples(spark).union(spark.createDataFrame(
        [("m:x", "version", ">=1.0", False, None, None)],
        _triples(spark).schema))
    rows = match_bgp(extra, [("?f", "imports", "?m")],
                     optional=[("?m", "version", "?v")],
                     project=["f", "m", "v"]).collect()
    by_m = {(r["f"], r["m"]): r["v"] for r in rows}
    assert by_m[("f:a", "m:x")] == ">=1.0"
    assert by_m[("f:c", "m:y")] is None  # OPTIONAL keeps unmatched rows
    with pytest.raises(ValueError, match="optional"):
        match_bgp(extra, [("?f", "imports", "?m")],
                  optional=[("?z", "version", "?v")])


def test_filter_expression(spark):
    rows = match_bgp(_triples(spark), [
        ("?f", "imports", "?m"), ("?f", "inRepo", "?r")],
        filters=["r = 'r:1'"], project=["f"]).collect()
    assert sorted(r["f"] for r in rows) == ["f:a", "f:c"]


def test_constant_pattern_is_existence_guard(spark):
    t = _triples(spark)
    # constraint holds -> rows pass through un-multiplied (even though
    # TWO type triples exist, the guard is 1-or-0 rows, never a product)
    rows = match_bgp(t, [("?f", "imports", "?m"),
                         ("m:x", "type", "Module")]).collect()
    assert len(rows) == 4
    # constraint fails -> empty result
    assert match_bgp(t, [("?f", "imports", "?m"),
                         ("m:zzz", "type", "Module")]).count() == 0
    # constant pattern FIRST also works
    assert match_bgp(t, [("m:x", "type", "Module"),
                         ("?f", "imports", "?m")]).count() == 4


def test_unbound_projection_rejected(spark):
    with pytest.raises(ValueError, match="not bound"):
        match_bgp(_triples(spark), [("?f", "imports", "?m")],
                  project=["nope"])


def test_property_path_one_or_more(spark):
    from rdf_tabular_spark.kg.query import match_bgp

    rows = [
        ("a", "dep", "b", True), ("b", "dep", "c", True),
        ("c", "dep", "d", True), ("x", "other", "y", True),
        ("a", "lang", "py", False),
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean")
    got = {(r.x, r.y) for r in match_bgp(t, [("?x", "dep+", "?y")]).collect()}
    assert got == {("a", "b"), ("b", "c"), ("c", "d"),
                   ("a", "c"), ("b", "d"), ("a", "d")}
    # bounded: 1 hop only
    got1 = {(r.x, r.y)
            for r in match_bgp(t, [("?x", "dep+", "?y")],
                               path_max_hops=1).collect()}
    assert got1 == {("a", "b"), ("b", "c"), ("c", "d")}
    # constant subject: everything reachable from a
    from_a = {r.y for r in match_bgp(t, [("a", "dep+", "?y")]).collect()}
    assert from_a == {"b", "c", "d"}
    # composes with a plain pattern on a shared variable
    joined = match_bgp(
        t, [("?x", "dep+", "d"), ("?x", "lang", "?l")]).collect()
    assert [(r.x, r.l) for r in joined] == [("a", "py")]


def test_union_bgp(spark):
    from rdf_tabular_spark.kg.query import union_bgp

    t = spark.createDataFrame(
        [("a", "imports", "m1", True), ("b", "dep", "m2", True),
         ("a", "dep", "m1", True)],
        "subj string, pred string, obj string, obj_is_iri boolean")
    got = {(r.f, r.m) for r in union_bgp(
        t, [[("?f", "imports", "?m")], [("?f", "dep", "?m")]],
        project=["f", "m"]).collect()}
    # set semantics: (a, m1) appears once despite two edge kinds
    assert got == {("a", "m1"), ("b", "m2")}

    with pytest.raises(ValueError):
        union_bgp(t, [], project=["f"])


def test_minus_bgp(spark):
    from rdf_tabular_spark.kg.query import minus_bgp

    t = spark.createDataFrame(
        [("a", "imports", "m1", True), ("b", "imports", "m2", True),
         ("a", "defines", "s1", True)],
        "subj string, pred string, obj string, obj_is_iri boolean")
    got = {r.f for r in minus_bgp(
        t, [("?f", "imports", "?m")],
        minus=[("?f", "defines", "?s")]).collect()}
    assert got == {"b"}  # a is removed: it defines something

    with pytest.raises(ValueError):
        # disjoint MINUS group would remove nothing — rejected loudly
        minus_bgp(t, [("?f", "imports", "?m")],
                  minus=[("?x", "defines", "?s")])


def test_minus_bgp_projection_does_not_shrink_shared_vars(spark):
    """MINUS compatibility is decided on the FULL bindings; projecting to
    ?f must not change which solutions are removed."""
    from rdf_tabular_spark.kg.query import minus_bgp

    t = spark.createDataFrame(
        [("a", "imports", "m1", True), ("a", "imports", "m2", True),
         ("a", "defines", "m1", True)],
        "subj string, pred string, obj string, obj_is_iri boolean")
    got = {r.f for r in minus_bgp(
        t, [("?f", "imports", "?m")],
        minus=[("?f", "defines", "?m")], project=["f"]).collect()}
    # (a, m2) survives the MINUS (shared vars f AND m), so a stays
    assert got == {"a"}


def test_union_bgp_bag_semantics(spark):
    from rdf_tabular_spark.kg.query import union_bgp

    t = spark.createDataFrame(
        [("a", "imports", "m1", True), ("a", "dep", "m1", True)],
        "subj string, pred string, obj string, obj_is_iri boolean")
    bag = union_bgp(t, [[("?f", "imports", "?m")], [("?f", "dep", "?m")]],
                    project=["f", "m"], distinct=False).collect()
    assert len(bag) == 2  # bag semantics keeps both branch solutions


def test_property_path_inverse_star_alternation(spark):
    from rdf_tabular_spark.kg.query import match_bgp

    rows = [
        ("a", "dep", "b", True), ("b", "dep", "c", True),
        ("x", "uses", "b", True),
        ("a", "lang", "py", False),
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean")

    # inverse: ^dep swaps direction
    inv = {(r.x, r.y) for r in match_bgp(t, [("?x", "^dep", "?y")]).collect()}
    assert inv == {("b", "a"), ("c", "b")}

    # zero-or-more: dep+ pairs plus one (n, n) per graph NODE (subjects
    # and IRI objects; the literal "py" is not a node)
    star = {(r.x, r.y)
            for r in match_bgp(t, [("?x", "dep*", "?y")]).collect()}
    nodes = {"a", "b", "c", "x"}
    assert star == {("a", "b"), ("b", "c"), ("a", "c")} | {
        (n, n) for n in nodes}

    # alternation: dep|uses
    alt = {(r.x, r.y)
           for r in match_bgp(t, [("?x", "dep|uses", "?y")]).collect()}
    assert alt == {("a", "b"), ("b", "c"), ("x", "b")}

    # composition: inverse of one-or-more (^dep+ = reachable backwards)
    invplus = {(r.x, r.y)
               for r in match_bgp(t, [("?x", "^dep+", "?y")]).collect()}
    assert invplus == {("b", "a"), ("c", "b"), ("c", "a")}


def test_aggregate_bgp_and_modifiers(spark):
    """GROUP BY over the solution multiset (bag semantics), HAVING, and
    ORDER BY DESC + LIMIT through the top-k path."""
    from rdf_tabular_spark.kg.query import aggregate_bgp, solution_modifiers

    t = spark.createDataFrame(
        [("f1", "imports", "a", True), ("f1", "imports", "b", True),
         ("f2", "imports", "a", True), ("f3", "imports", "a", True),
         ("f1", "inRepo", "r1", True), ("f2", "inRepo", "r1", True),
         ("f3", "inRepo", "r2", True)],
        "subj string, pred string, obj string, obj_is_iri boolean")

    agg = aggregate_bgp(
        t, [("?f", "imports", "?m"), ("?f", "inRepo", "?r")],
        group_by=["r"], aggs={"n": "count(distinct m)",
                              "links": "count(*)"})
    rows = {r["r"]: (r["n"], r["links"]) for r in agg.collect()}
    # bag semantics: r1 has 3 solution rows (f1x2 + f2), 2 distinct mods
    assert rows == {"r1": (2, 3), "r2": (1, 1)}

    top = solution_modifiers(agg, order_by=["n DESC", "r"], limit=1)
    assert [(r["r"], r["n"]) for r in top.collect()] == [("r1", 2)]
    plan = top._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "TakeOrdered" in plan

    off = solution_modifiers(agg, order_by=["n DESC", "r"],
                             limit=1, offset=1)
    assert [r["r"] for r in off.collect()] == ["r2"]

    hav = aggregate_bgp(
        t, [("?f", "imports", "?m"), ("?f", "inRepo", "?r")],
        group_by=["r"], aggs={"n": "count(distinct m)"}, having=["n >= 2"])
    assert [r["r"] for r in hav.collect()] == ["r1"]


def test_offset_without_limit_is_native(spark):
    """OFFSET with no LIMIT must stay a distributed plan (DataFrame
    .offset, Spark >=3.4) — the old path collected the WHOLE solution
    set to the driver. Multi-partition input, both ordered and not."""
    from rdf_tabular_spark.kg.query import solution_modifiers

    df = spark.range(0, 1000, 1, 16).selectExpr("id AS n")
    ordered = solution_modifiers(df, order_by=["n"], offset=990)
    assert [r["n"] for r in ordered.collect()] == list(range(990, 1000))
    unordered = solution_modifiers(df, offset=995)
    assert unordered.count() == 5
    # the plan is a physical offset, not a driver-side re-parallelize
    for out in (ordered, unordered):
        plan = out._jdf.queryExecution().executedPlan().toString()
        # TakeOrderedAndProject(..., offset=n) / CollectLimit -1, n /
        # GlobalLimit with offset — whichever Spark picks, it's native
        assert ("offset=" in plan or "Offset" in plan
                or "CollectLimit" in plan), plan
        assert "Scan ExistingRDD" not in plan  # no collect+createDataFrame


def test_zero_or_one_path(spark):
    """imports? = the single-hop edges plus a zero-length row per node."""
    got = {(r["s"], r["o"]) for r in match_bgp(
        _triples(spark), [("?s", "imports?", "?o")]).collect()}
    # one-hop matches present
    assert {("f:a", "m:x"), ("f:c", "m:y")} <= got
    # zero-length rows: every node matches itself (even edge-less r:1)
    assert {("r:1", "r:1"), ("m:y", "m:y"), ("f:a", "f:a")} <= got
    # but NO two-hop rows: imports? never composes hops
    assert ("f:a", "r:1") not in got


def test_closed_alternation_path(spark):
    """(p|q)+ closes the UNION of the edge sets — distinct from the
    bare p+|q+ form, which is the union of the per-predicate closures."""
    from rdf_tabular_spark.kg.query import match_bgp

    rows = [
        ("a", "dep", "b", True), ("b", "uses", "c", True),
        ("c", "dep", "d", True),
        ("q", "same", "r", True), ("s", "same", "r", True),
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean")
    got = {(r.x, r.y) for r in match_bgp(
        t, [("?x", "(dep|uses)+", "?y")]).collect()}
    assert got == {("a", "b"), ("b", "c"), ("c", "d"),
                   ("a", "c"), ("b", "d"), ("a", "d")}
    # bare form: per-predicate closures only — a cannot cross into uses
    bare = {(r.x, r.y) for r in match_bgp(
        t, [("?x", "dep+|uses+", "?y")]).collect()}
    assert bare == {("a", "b"), ("c", "d"), ("b", "c")}
    # equivalence reachability: (same|^same)* connects q, r, s both ways
    eq = {r.y for r in match_bgp(
        t, [("q", "(same|^same)*", "?y")]).collect()}
    assert eq == {"q", "r", "s"}
    # inverse of a closed alternation: ^(dep|uses)+ walks backwards
    inv = {r.y for r in match_bgp(
        t, [("d", "^(dep|uses)+", "?y")]).collect()}
    assert inv == {"a", "b", "c"}


def test_sequence_path(spark):
    """imports/type chains through the intermediate module variable."""
    got = {(r["f"], r["t"]) for r in match_bgp(
        _triples(spark),
        [("?f", ("/", "imports", "type"), "?t")]).collect()}
    assert got == {("f:a", "Module"), ("f:b", "Module"), ("f:c", "Module")}


def test_sequence_path_with_constant_endpoint(spark):
    got = {r["f"] for r in match_bgp(
        _triples(spark),
        [("?f", ("/", "imports", "type"), "Module")]).collect()}
    assert got == {"f:a", "f:b", "f:c"}


def test_sequence_composes_with_inverse(spark):
    """imports/^imports = co-import pairs (files sharing a module)."""
    got = {(r["a"], r["b"]) for r in match_bgp(
        _triples(spark),
        [("?a", ("/", "imports", "^imports"), "?b")]).collect()}
    assert ("f:a", "f:b") in got and ("f:b", "f:a") in got
    assert ("f:a", "f:c") not in got  # different modules


def test_sequence_needs_two_steps(spark):
    with pytest.raises(ValueError):
        match_bgp(_triples(spark), [("?a", ("/", "imports"), "?b")])


# -- CONSTRUCT ---------------------------------------------------------------

def test_construct_basic_graph(spark):
    from rdf_tabular_spark.kg.query import construct

    out = construct(
        _triples(spark),
        [("?f", "imports", "?m"), ("?g", "imports", "?m")],
        template=[("?f", "coImports", "?g")],
        filters=["f < g"])
    rows = {(r.subj, r.pred, r.obj, r.obj_is_iri) for r in out.collect()}
    assert rows == {("f:a", "coImports", "f:b", True)}
    assert out.columns == ["subj", "pred", "obj",
                           "obj_is_iri", "obj_datatype", "obj_lang"]


def test_construct_multi_template_dedup(spark):
    from rdf_tabular_spark.kg.query import construct

    # two files import m:x -> the constant-subject template instantiates
    # twice but the GRAPH holds it once (set semantics)
    out = construct(
        _triples(spark),
        [("?f", "imports", "m:x")],
        template=[("?f", "type", "Importer"),
                  ("m:x", "popular", "true", False)])
    rows = {(r.subj, r.pred, r.obj, r.obj_is_iri) for r in out.collect()}
    assert rows == {("f:a", "type", "Importer", True),
                    ("f:b", "type", "Importer", True),
                    ("m:x", "popular", "true", False)}


def test_construct_incremental_parity(spark):
    """construct(old ∪ Δ) == construct(old) ∪ construct_incremental;
    with old_view passed, the increment is disjoint from the old view."""
    from rdf_tabular_spark.kg.query import construct, construct_incremental

    full = _triples(spark)
    # the delta is f:b's imports edge — it creates the (f:a, f:b) pair
    delta = full.filter((F.col("subj") == "f:b")
                        & (F.col("pred") == "imports"))
    old = full.exceptAll(delta)
    pats = [("?f", "imports", "?m"), ("?g", "imports", "?m")]
    tmpl = [("?f", "coImports", "?g"), ("?g", "coImports", "?f")]
    want = {(r.subj, r.obj) for r in
            construct(full, pats, template=tmpl).collect()}
    old_view = construct(old, pats, template=tmpl)
    inc = construct_incremental(old, delta, pats, tmpl,
                                old_view=old_view)
    got_old = {(r.subj, r.obj) for r in old_view.collect()}
    got_inc = {(r.subj, r.obj) for r in inc.collect()}
    assert got_old | got_inc == want
    assert got_old & got_inc == set()          # anti-joined away
    assert ("f:a", "f:b") in got_inc           # the genuinely-new pair
    # filters thread through the delta terms
    inc_f = construct_incremental(
        old, delta, pats, [("?f", "coImports", "?g")],
        filters=["f < g"], old_view=old_view)
    assert {(r.subj, r.obj) for r in inc_f.collect()} == {("f:a", "f:b")}
    # property paths are rejected loudly
    with pytest.raises(ValueError, match="plain patterns"):
        construct_incremental(old, delta, [("?f", "imports+", "?m")],
                              [("?f", "reaches", "?m")])


def test_construct_optional_unbound_drops_instantiation(spark):
    from rdf_tabular_spark.kg.query import construct

    # f:b is in r:2; only the OPTIONAL pattern binds ?r for r:1 rows of
    # a different shape — use a repo filter that cannot match f:b
    out = construct(
        _triples(spark),
        [("?f", "imports", "?m")],
        template=[("?f", "repoOf", "?r")],
        optional=[("?f", "inRepo", "?r")])
    # f:loop has no inRepo triple -> its ?r is NULL -> dropped
    rows = {(r.subj, r.obj) for r in out.collect()}
    assert rows == {("f:a", "r:1"), ("f:b", "r:2"), ("f:c", "r:1")}


def test_construct_unbound_template_var_raises(spark):
    from rdf_tabular_spark.kg.query import construct

    with pytest.raises(ValueError, match="not bound"):
        construct(_triples(spark), [("?f", "imports", "?m")],
                  template=[("?f", "x", "?nope")])


# -- DESCRIBE ----------------------------------------------------------------

def _bnode_graph(spark):
    rows = [
        ("t:1", "row", "_:r1", True),
        ("t:1", "url", "file.csv", False),
        ("_:r1", "describes", "_:b1", True),
        ("_:r1", "rownum", "1", False),
        ("_:b1", "name", "alice", False),
        ("_:b1", "knows", "p:bob", True),   # named IRI: boundary
        ("p:bob", "name", "bob", False),    # must NOT be pulled in
        ("t:2", "row", "_:r2", True),       # different table: not seeded
        ("_:r2", "rownum", "1", False),
    ]
    return spark.createDataFrame(
        [(s, p, o, iri, None, None) for s, p, o, iri in rows],
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, obj_lang string")


def test_describe_bnode_closure_and_iri_boundary(spark):
    from rdf_tabular_spark.kg.query import describe

    g = _bnode_graph(spark)
    seed = spark.createDataFrame([("t:1",)], "subj string")
    got = {(r.subj, r.pred, r.obj) for r in describe(g, seed).collect()}
    assert got == {
        ("t:1", "row", "_:r1"), ("t:1", "url", "file.csv"),
        ("_:r1", "describes", "_:b1"), ("_:r1", "rownum", "1"),
        ("_:b1", "name", "alice"), ("_:b1", "knows", "p:bob"),
    }


def test_describe_literal_bnode_lookalike_not_followed(spark):
    from rdf_tabular_spark.kg.query import describe

    g = spark.createDataFrame(
        [("t:1", "note", "_:r1", False, None, None),
         ("_:r1", "x", "y", False, None, None)],
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, obj_lang string")
    seed = spark.createDataFrame([("t:1",)], "subj string")
    got = {(r.subj, r.obj) for r in describe(g, seed).collect()}
    assert got == {("t:1", "_:r1")}  # literal object is not a node


# -- FILTER EXISTS / NOT EXISTS ----------------------------------------------

def test_not_exists_shared_vars(spark):
    from rdf_tabular_spark.kg.query import exists_bgp

    # files importing something but NOT in repo r:1
    rows = exists_bgp(
        _triples(spark), [("?f", "imports", "?m")],
        exists=[("?f", "inRepo", "r:1")], negate=True,
        project=["f"]).collect()
    assert sorted(r["f"] for r in rows) == ["f:b", "f:loop"]


def test_exists_shared_vars(spark):
    from rdf_tabular_spark.kg.query import exists_bgp

    rows = exists_bgp(
        _triples(spark), [("?f", "imports", "?m")],
        exists=[("?f", "inRepo", "r:1")], project=["f"]).collect()
    assert sorted(r["f"] for r in rows) == ["f:a", "f:c"]


def test_not_exists_disjoint_is_truth_test_unlike_minus(spark):
    from rdf_tabular_spark.kg.query import exists_bgp, minus_bgp

    # the classic divergence: the group shares no variable. MINUS
    # refuses (would remove nothing); NOT EXISTS eliminates EVERYTHING
    # because the group matches somewhere in the graph.
    with pytest.raises(ValueError, match="shares no variable"):
        minus_bgp(_triples(spark), [("?f", "imports", "?m")],
                  minus=[("?x", "type", "Module")])
    out = exists_bgp(_triples(spark), [("?f", "imports", "?m")],
                     exists=[("?x", "type", "Module")], negate=True)
    assert out.isEmpty()
    # and a group that matches NOTHING eliminates nothing
    kept = exists_bgp(_triples(spark), [("?f", "imports", "?m")],
                      exists=[("?x", "type", "Nothing")], negate=True)
    assert kept.count() == 4


# -- VALUES --------------------------------------------------------------

def test_values_binds_solutions(spark):
    from rdf_tabular_spark.kg.query import values_bgp

    rows = values_bgp(
        _triples(spark), [("?f", "imports", "?m"), ("?f", "inRepo", "?r")],
        values=[{"m": "m:x"}, {"m": "m:zzz"}]).collect()
    assert sorted((r.f, r.m, r.r) for r in rows) == [
        ("f:a", "m:x", "r:1"), ("f:b", "m:x", "r:2")]


def test_values_multi_var_rows(spark):
    from rdf_tabular_spark.kg.query import values_bgp

    rows = values_bgp(
        _triples(spark), [("?f", "imports", "?m"), ("?f", "inRepo", "?r")],
        values=[{"m": "m:x", "r": "r:1"}, {"m": "m:y", "r": "r:1"}]).collect()
    assert sorted((r.f, r.m) for r in rows) == [("f:a", "m:x"), ("f:c", "m:y")]


def test_values_validation(spark):
    from rdf_tabular_spark.kg.query import values_bgp

    with pytest.raises(ValueError, match="empty VALUES"):
        values_bgp(_triples(spark), [("?f", "imports", "?m")], values=[])
    with pytest.raises(ValueError, match="not bound"):
        values_bgp(_triples(spark), [("?f", "imports", "?m")],
                   values=[{"nope": "1"}])


def test_values_undef_rows(spark):
    """Rows may omit variables (SPARQL UNDEF): a row constrains only
    what it binds, and a solution passes if compatible with ANY row."""
    from rdf_tabular_spark.kg.query import values_bgp

    got = values_bgp(
        _triples(spark), [("?f", "imports", "?m"), ("?f", "inRepo", "?r")],
        values=[{"m": "m:y"}, {"m": "m:x", "r": "r:2"}]).collect()
    assert sorted((r.f, r.m, r.r) for r in got) == [
        ("f:b", "m:x", "r:2"), ("f:c", "m:y", "r:1")]
    # an all-UNDEF row is a wildcard: every solution passes
    wild = values_bgp(
        _triples(spark), [("?f", "imports", "?m")],
        values=[{}, {"m": "m:zzz"}]).collect()
    assert len(wild) == 4


def test_ask_true_and_false(spark):
    from rdf_tabular_spark.kg.query import ask

    t = _triples(spark)
    assert ask(t, [("?f", "imports", "m:x")]).collect()[0]["ask"] is True
    assert ask(t, [("?f", "imports", "m:zzz")]).collect()[0]["ask"] is False
    # conjunction + filter participate like any BGP
    assert ask(t, [("?f", "imports", "?m"), ("?f", "inRepo", "r:2")],
               filters=["m = 'm:x'"]).collect()[0]["ask"] is True
    assert ask(t, [("?f", "imports", "?m"), ("?f", "inRepo", "r:2")],
               filters=["m = 'm:y'"]).collect()[0]["ask"] is False


def test_negated_property_set(spark):
    t = _triples(spark)
    got = {(r["f"], r["o"]) for r in match_bgp(
        t, [("?f", "!(imports|type)", "?o")]).collect()}
    assert got == {("f:a", "r:1"), ("f:b", "r:2"), ("f:c", "r:1")}
    # single-member form without parens
    got1 = {r["o"] for r in match_bgp(
        t, [("f:a", "!imports", "?o")]).collect()}
    assert got1 == {"r:1"}
    # bans everything that matches -> empty, not an error
    assert match_bgp(t, [("f:a", "!(imports|inRepo)", "?o")]).count() == 0


def test_negated_property_set_rejects_bad_forms(spark):
    t = _triples(spark)
    with pytest.raises(ValueError, match="empty negated"):
        match_bgp(t, [("?f", "!()", "?o")])
    with pytest.raises(ValueError, match="inverse members"):
        match_bgp(t, [("?f", "!(imports|^type)", "?o")])


def test_bind_expression(spark):
    from rdf_tabular_spark.kg.query import match_bgp

    t = _triples(spark)
    rows = match_bgp(t, [("?f", "imports", "?m")],
                     bind={"local": "substring(m, 3)"},
                     filters=["local != 'loop'"],
                     project=["f", "m", "local"]).collect()
    got = {(r["f"], r["local"]) for r in rows}
    assert got == {("f:a", "x"), ("f:b", "x"), ("f:c", "y")}
    # rebinding an in-scope variable is a loud error (SPARQL §10.1)
    with pytest.raises(ValueError, match="already bound"):
        match_bgp(t, [("?f", "imports", "?m")], bind={"m": "upper(m)"})


def test_subquery_joins_on_shared_vars(spark):
    from rdf_tabular_spark.kg.query import aggregate_bgp, subquery_bgp

    t = _triples(spark)
    inner = aggregate_bgp(t, [("?m", "imports|type", "?x")],
                          group_by=["m"], aggs={"n": "count(*)"})
    # outer: files importing ?m, annotated with the subquery's count
    rows = subquery_bgp(t, [("?f", "imports", "?m")], sub=inner,
                        project=["f", "m", "n"]).collect()
    by_fm = {(r["f"], r["m"]): r["n"] for r in rows}
    assert by_fm[("f:a", "m:x")] == 1  # m:x has one outgoing (type) triple
    assert by_fm[("f:loop", "f:loop")] == 1  # the self-loop's own imports
    # a subquery sharing no variable is rejected (would be cartesian)
    disjoint = aggregate_bgp(t, [("?z", "type", "Module")],
                             group_by=["z"], aggs={"k": "count(*)"})
    with pytest.raises(ValueError, match="cartesian"):
        subquery_bgp(t, [("?f", "inRepo", "?r")], sub=disjoint)


def test_reorder_patterns_selectivity_and_connectivity():
    from rdf_tabular_spark.kg.query import reorder_patterns

    # written: open scan first, fully-bound last — the heuristic inverts
    # it and keeps the chain connected at every step
    pats = [
        ("?f", "?p", "?o"),            # ? ? ?  (least selective)
        ("?f", "imports", "?m"),       # ? p ?
        ("?m", "type", "Module"),      # ? p o
        ("f:a", "inRepo", "r:1"),      # s p o  (most selective)
    ]
    got = reorder_patterns(pats)
    assert got[0] == ("f:a", "inRepo", "r:1")
    # nothing connects to the constant pattern; next best overall is the
    # (? p o) pattern, then its connected (? p ?), then the open scan
    assert got[1] == ("?m", "type", "Module")
    assert got[2] == ("?f", "imports", "?m")
    assert got[3] == ("?f", "?p", "?o")


def test_reorder_prefers_plain_over_path_and_is_stable():
    from rdf_tabular_spark.kg.query import reorder_patterns

    pats = [("?x", "dep+", "?y"), ("?x", "imports", "?y")]
    assert reorder_patterns(pats)[0] == ("?x", "imports", "?y")
    # equal-rank patterns keep written order
    same = [("?a", "p1", "?b"), ("?b", "p2", "?c")]
    assert reorder_patterns(same) == same


def test_reorder_same_solution_set(spark):
    from rdf_tabular_spark.kg.query import match_bgp

    pats = [
        ("?f", "?p", "?m"),
        ("?m", "type", "Module"),
        ("?f", "inRepo", "r:1"),
    ]
    plain = {tuple(sorted(r.asDict().items())) for r in match_bgp(
        _triples(spark), pats).collect()}
    opt = {tuple(sorted(r.asDict().items())) for r in match_bgp(
        _triples(spark), pats, reorder=True).collect()}
    assert plain == opt and plain


# -------------------------------------------------- term metadata (r4)

def _meta_triples(spark):
    rows = [
        ("f:a", "label", "hello", False, None, "en"),
        ("f:a", "label", "bonjour", False, None, "fr"),
        ("f:a", "size", "42", False, "xsd:integer", None),
        ("f:a", "name", "plain", False, None, None),
        ("f:a", "link", "m:x", True, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, obj_lang string")


def test_term_meta_lang_filter(spark):
    got = match_bgp(
        _meta_triples(spark), [("?s", "label", "?v")],
        term_meta=["v"], filters=["v__lang = 'en'"]).collect()
    assert [(r.s, r.v) for r in got] == [("f:a", "hello")]


def test_term_meta_datatype_and_isiri(spark):
    t = _meta_triples(spark)
    typed = match_bgp(t, [("?s", "?p", "?v")], term_meta=["v"],
                      filters=["v__datatype = 'xsd:integer'"],
                      project=["p", "v"]).collect()
    assert [(r.p, r.v) for r in typed] == [("size", "42")]
    iris = match_bgp(t, [("?s", "?p", "?v")], term_meta=["v"],
                     filters=["v__isiri"], project=["v"]).collect()
    assert [r.v for r in iris] == ["m:x"]


def test_term_meta_first_binder_not_a_join_key(spark):
    # ?v is an object in TWO patterns; only the first binds metadata, so
    # the join stays on the term value and NULL metadata can't drop rows
    t = _meta_triples(spark).union(spark.createDataFrame(
        [("f:b", "alias", "hello", False, None, None)],
        _meta_triples(spark).schema))
    got = match_bgp(t, [("?s", "label", "?v"), ("?s2", "alias", "?v")],
                    term_meta=["v"],
                    project=["s", "s2", "v", "v__lang"]).collect()
    assert [(r.s, r.s2, r.v, r.v__lang) for r in got] == [
        ("f:a", "f:b", "hello", "en")]


def test_term_meta_unbound_raises(spark):
    with pytest.raises(ValueError, match="never bound"):
        match_bgp(_meta_triples(spark), [("?s", "label", "?v")],
                  term_meta=["s"]).collect()


def test_predicate_stats_shapes(spark):
    from rdf_tabular_spark.kg.query import predicate_stats

    stats = predicate_stats(_triples(spark))
    # exact triple counts per predicate; HLL distincts are exact at
    # this cardinality
    total = _triples(spark).count()
    assert stats[None][0] == total
    assert sum(n for p, (n, _, _) in stats.items() if p is not None) \
        == total
    assert all(ds >= 1 and do >= 1 for _, ds, do in stats.values())


def test_stats_reorder_beats_shape_ties(spark):
    from rdf_tabular_spark.kg.query import (predicate_stats,
                                            reorder_patterns)

    t = _triples(spark)
    counts = {r.pred: r.n for r in
              t.groupBy("pred").agg(F.count("*").alias("n")).collect()}
    rare = min(counts, key=counts.get)
    common = max(counts, key=counts.get)
    assert counts[rare] < counts[common]
    # same (? p ?) shape: the stats-free rank ties (keeps written
    # order), stats inverts to rare-first
    pats = [("?a", common, "?b"), ("?b", rare, "?c")]
    assert reorder_patterns(pats) == pats
    got = reorder_patterns(pats, stats=predicate_stats(t))
    assert got[0] == ("?b", rare, "?c")


def test_stats_reorder_absent_pred_first_and_same_solutions(spark):
    from rdf_tabular_spark.kg.query import (match_bgp, predicate_stats,
                                            reorder_patterns)

    t = _triples(spark)
    stats = predicate_stats(t)
    pats = [("?f", "imports", "?m"), ("?f", "noSuchPred", "?z")]
    # an absent predicate empties the join: cheapest, goes first
    assert reorder_patterns(pats, stats=stats)[0] == \
        ("?f", "noSuchPred", "?z")
    # and a dict passed as reorder= flows through match_bgp unchanged
    pats2 = [("?f", "?p", "?m"), ("?m", "type", "Module"),
             ("?f", "inRepo", "r:1")]
    plain = {tuple(sorted(r.asDict().items()))
             for r in match_bgp(t, pats2).collect()}
    st = {tuple(sorted(r.asDict().items()))
          for r in match_bgp(t, pats2, reorder=stats).collect()}
    assert plain == st and plain
