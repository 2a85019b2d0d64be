"""betweenness (k-source integer Brandes), modularity, characteristic
sets — engine vs hand-computed values and a pure-Python replay of the
exact integer rules (kg/graph.py r4 tail 4)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest

from rdf_tabular_spark.kg import graph as G


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src string, dst string")


def ref_betweenness(pairs, k_sources, max_hops, seed=7):
    """Pure-Python replay of the engine's declared integer rule."""
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    nodes = sorted(adj)
    pivots = sorted(
        nodes,
        key=lambda n: (hashlib.md5(f"btw|{seed}|{n}".encode()).hexdigest(), n),
    )[:k_sources]
    res = {n: 0 for n in nodes}
    for s in pivots:
        dist, sigma = {s: 0}, {s: 1}
        layers = [[s]]
        frontier = [s]
        for h in range(1, max_hops + 1):
            nxt: dict[str, int] = {}
            for v in frontier:
                for w in adj[v]:
                    if w not in dist:
                        nxt[w] = nxt.get(w, 0) + sigma[v]
            if not nxt:
                break
            for w, sg in nxt.items():
                dist[w], sigma[w] = h, sg
            frontier = sorted(nxt)
            layers.append(frontier)
        delta = {n: 0 for n in dist}
        for d in range(len(layers) - 2, -1, -1):
            for v in layers[d]:
                delta[v] = sum(
                    (sigma[v] * (1_000_000 + delta[w])) // sigma[w]
                    for w in adj[v] if dist.get(w) == d + 1)
        for n in dist:
            if n != s:
                res[n] += delta[n]
    return res


PATH5 = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
DIAMOND = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")]


def test_betweenness_path_graph_exact(spark):
    # path a-b-c-d-e, all 5 nodes as pivots: classic betweenness of the
    # interior nodes is b=3, c=4, d=3 per direction -> x2 directions,
    # x1e6 micro-units; sigma=1 everywhere so no truncation loss
    out = {
        r["node"]: r["betweenness_micro"]
        for r in G.betweenness(_edges_df(spark, PATH5), k_sources=5,
                               max_hops=4).collect()
    }
    assert out == {"a": 0, "b": 6_000_000, "c": 8_000_000,
                   "d": 6_000_000, "e": 0}


def test_betweenness_multiplicity_matches_reference(spark):
    # diamond + tail: sigma(d from a) = 2, so b and c split dependency
    # via the integer DIV rule — engine must equal the pure replay
    for k, hops in ((6, 4), (3, 2), (2, 3)):
        got = {
            r["node"]: r["betweenness_micro"]
            for r in G.betweenness(_edges_df(spark, DIAMOND), k_sources=k,
                                   max_hops=hops).collect()
        }
        assert got == ref_betweenness(DIAMOND, k, hops)


def test_betweenness_hop_bound_truncates(spark):
    # with max_hops=1 no node is interior to any shortest path
    out = G.betweenness(_edges_df(spark, PATH5), k_sources=5, max_hops=1)
    assert all(r["betweenness_micro"] == 0 for r in out.collect())


def test_betweenness_partition_invariant(spark):
    df = _edges_df(spark, DIAMOND).repartition(7)
    got = {r["node"]: r["betweenness_micro"]
           for r in G.betweenness(df, k_sources=6, max_hops=4).collect()}
    assert got == ref_betweenness(DIAMOND, 6, 4)


TWO_TRIANGLES = [("a", "b"), ("b", "c"), ("a", "c"),
                 ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")]


def _labels_df(spark, mapping):
    return spark.createDataFrame(
        list(mapping.items()), "node string, label string")


def test_modularity_two_triangles(spark):
    # two triangles joined by one edge, one community per triangle:
    # m=7, e_c=3 each, d_c=7 each -> Q = 70/196 = 5/14
    labels = _labels_df(spark, {"a": "L", "b": "L", "c": "L",
                                "x": "R", "y": "R", "z": "R"})
    row = G.modularity(_edges_df(spark, TWO_TRIANGLES), labels).collect()[0]
    assert (row["n_communities"], row["m_edges"]) == (2, 7)
    assert row["q_numer"] == 4 * 7 * 6 - (49 + 49) == 70
    assert row["q_micro"] == (70 * 1_000_000) // 196  # 357142


def test_modularity_negative_floor(spark):
    # single edge split across two communities: Q = -1/2 exactly; the
    # portable integer floor must land on -500000 (not truncate to -499999)
    row = G.modularity(
        _edges_df(spark, [("a", "b")]),
        _labels_df(spark, {"a": "p", "b": "q"})).collect()[0]
    assert row["q_numer"] == -2
    assert row["q_micro"] == -500_000


def test_modularity_single_community_is_zero(spark):
    # everything in one community: Q = m/m - (2m/2m)^2 = 0 exactly
    labels = _labels_df(spark, {n: "one" for n in "abcxyz"})
    row = G.modularity(_edges_df(spark, TWO_TRIANGLES), labels).collect()[0]
    assert row["q_numer"] == 0 and row["q_micro"] == 0


def test_modularity_duplicate_and_self_edges_ignored(spark):
    noisy = TWO_TRIANGLES + [("a", "b"), ("b", "a"), ("c", "c")]
    labels = _labels_df(spark, {"a": "L", "b": "L", "c": "L",
                                "x": "R", "y": "R", "z": "R"})
    row = G.modularity(_edges_df(spark, noisy), labels).collect()[0]
    assert (row["m_edges"], row["q_numer"]) == (7, 70)


def test_characteristic_sets(spark):
    from rdf_tabular_spark.kg.materialize import characteristic_sets

    triples = spark.createDataFrame(
        [("s1", "p", "1"), ("s1", "q", "2"), ("s1", "q", "3"),
         ("s2", "p", "1"), ("s2", "q", "9"),
         ("s3", "p", "0")],
        "subj string, pred string, obj string")
    got = {r["char_set"]: (r["n_preds"], r["n_subjects"], r["n_triples"])
           for r in characteristic_sets(triples).collect()}
    # s1 and s2 share {p,q} (s1 with multiplicity 3), s3 is {p}
    assert got == {"p|q": (2, 2, 5), "p": (1, 1, 1)}


def ref_refine(pairs, rounds, labels=None):
    """Pure-Python replay of modularity_refine's declared integer rule.
    *pairs* items are (a, b) for weight 1 or (a, b, w) — self-loops
    allowed in the weighted form (the contraction path)."""
    wadj = defaultdict(lambda: defaultdict(int))
    selfw = defaultdict(int)
    nodes = set()
    seen = set()
    for e in pairs:
        a, b, w = e if len(e) == 3 else (*e, None)
        if w is None:
            # unweighted: duplicates collapse, self-loops drop (a node
            # appearing ONLY in self-loops is absent, like the engine)
            key = (min(a, b), max(a, b))
            if a == b or key in seen:
                continue
            seen.add(key)
            w = 1
        nodes.add(a)
        nodes.add(b)
        if a == b:
            selfw[a] += w
            continue
        wadj[a][b] += w
        wadj[b][a] += w
    deg = {n: sum(wadj[n].values()) + 2 * selfw[n] for n in nodes}
    two_m = sum(deg.values())
    lab = dict(labels) if labels else {n: n for n in nodes}
    for _ in range(rounds):
        d_c = defaultdict(int)
        for n, l in lab.items():
            d_c[l] += deg[n]
        size = defaultdict(int)
        for l in lab.values():
            size[l] += 1
        new = {}
        for n in nodes:
            k_ic = defaultdict(int)
            for w2, ww in wadj[n].items():
                k_ic[lab[w2]] += ww
            k_ic.setdefault(lab[n], 0)
            own = lab[n]
            best = min(
                ((-(2 * two_m * k
                    - 2 * deg[n] * (d_c[c] - (deg[n] if c == own else 0))), c)
                 for c, k in k_ic.items()
                 # Leiden constraint: only singleton nodes may move
                 if (c == own or size[own] == 1)
                 # minimum-labeling singleton-swap guard
                 and not (c != own and size[own] == 1 and size[c] == 1
                          and c > own)))
            new[n] = best[1]
        # canonicalize: community id = min member node
        canon = {}
        for n, l in new.items():
            canon[l] = min(canon.get(l, n), n)
        lab = {n: canon[l] for n, l in new.items()}
    return lab


def ref_contract(pairs, lab):
    out = defaultdict(int)
    seen = set()
    for e in pairs:
        a, b, w = e if len(e) == 3 else (*e, None)
        if w is None:
            key = (min(a, b), max(a, b))
            if a == b or key in seen:
                continue
            seen.add(key)
            w = 1
        la, lb = lab[a], lab[b]
        out[(min(la, lb), max(la, lb))] += w
    return [(a, b, w) for (a, b), w in sorted(out.items())]


def ref_louvain(pairs, levels, rounds):
    lab = ref_refine(pairs, rounds)
    cur, mapping = pairs, lab
    for _ in range(1, levels):
        cur = ref_contract(cur, lab)
        up = ref_refine(cur, rounds)
        mapping = {n: up[l] for n, l in mapping.items()}
        lab = up
    return mapping


def test_modularity_refine_finds_triangles(spark):
    # two triangles + bridge, from singletons: each triangle collapses
    # into one community
    out = {r["node"]: r["label"] for r in G.modularity_refine(
        _edges_df(spark, TWO_TRIANGLES), rounds=3).collect()}
    assert len({out[n] for n in "abc"}) == 1
    assert len({out[n] for n in "xyz"}) == 1
    assert out["a"] != out["x"]


@pytest.mark.parametrize("rounds", [1, 2, 3])
def test_modularity_refine_matches_reference(spark, rounds):
    messy = TWO_TRIANGLES + DIAMOND + [("z", "d")]
    got = {r["node"]: r["label"] for r in G.modularity_refine(
        _edges_df(spark, messy), rounds=rounds).collect()}
    assert got == ref_refine(messy, rounds)


def test_modularity_refine_improves_q(spark):
    edges = _edges_df(spark, TWO_TRIANGLES)
    singles = spark.createDataFrame(
        [(n, n) for n in "abcxyz"], "node string, label string")
    q0 = G.modularity(edges, singles).collect()[0]["q_numer"]
    q1 = G.modularity(edges, G.modularity_refine(edges, rounds=3)) \
        .collect()[0]["q_numer"]
    assert q1 > q0


def test_weighted_sssp_bounded_bellman_ford(spark):
    wedges = spark.createDataFrame(
        [("s", "a", 1), ("a", "b", 1), ("s", "b", 5), ("b", "c", 1),
         ("s", "b", 4),  # parallel edge collapses to min
         ("c", "d", 10), ("x", "y", 1)],  # x,y unreachable from s
        "src string, dst string, w long")
    got = {r["node"]: r["dist"]
           for r in G.weighted_sssp(wedges, "s", max_hops=6).collect()}
    assert got == {"s": 0, "a": 1, "b": 2, "c": 3, "d": 13}
    # hop bound: within 1 hop the direct s->b edge (4) wins over s->a->b
    got1 = {r["node"]: r["dist"]
            for r in G.weighted_sssp(wedges, "s", max_hops=1).collect()}
    assert got1 == {"s": 0, "a": 1, "b": 4}


# ---------------------------------------------------------------------------
# Hypothesis: random graphs vs the pure-Python replays (each Spark round
# is expensive, so examples are few but adversarially shrunk)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_edge_st = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).map(
        lambda t: (f"n{t[0]}", f"n{t[1]}")),
    min_size=1, max_size=14)


@settings(max_examples=12, deadline=None)
@given(pairs=_edge_st, k=st.integers(1, 4), hops=st.integers(1, 3))
def test_betweenness_fuzz_matches_reference(spark, pairs, k, hops):
    simple = [p for p in pairs if p[0] != p[1]]
    if not simple:
        return
    got = {r["node"]: r["betweenness_micro"]
           for r in G.betweenness(_edges_df(spark, simple), k_sources=k,
                                  max_hops=hops).collect()}
    assert got == ref_betweenness(simple, k, hops)


@settings(max_examples=10, deadline=None)
@given(pairs=_edge_st, rounds=st.integers(1, 3))
def test_modularity_refine_fuzz_matches_reference(spark, pairs, rounds):
    simple = [p for p in pairs if p[0] != p[1]]
    if not simple:
        return
    got = {r["node"]: r["label"]
           for r in G.modularity_refine(_edges_df(spark, simple),
                                        rounds=rounds).collect()}
    assert got == ref_refine(simple, rounds)


def test_assortativity_star_is_negative(spark):
    # star K1,3: every edge joins degree 3 to degree 1 -> r = -1 exactly
    star = [("h", "a"), ("h", "b"), ("h", "c")]
    row = G.assortativity(_edges_df(spark, star)).collect()[0]
    assert row["r_numer"] == -row["r_denom"] != 0
    assert row["r_micro"] == -1_000_000


def test_assortativity_regular_graph_null(spark):
    # triangle: all degrees equal -> denominator 0 -> r undefined
    tri = [("a", "b"), ("b", "c"), ("a", "c")]
    row = G.assortativity(_edges_df(spark, tri)).collect()[0]
    assert row["r_denom"] == 0 and row["r_micro"] is None


def test_assortativity_reference_value(spark):
    # path a-b-c-d: edges (1,2),(2,2),(2,1) by degree; M=3, P=2+4+2=8,
    # S1=3+4+3=10, S2=5+8+5=18 -> r = (96-100)/(108-100) = -1/2
    path = [("a", "b"), ("b", "c"), ("c", "d")]
    row = G.assortativity(_edges_df(spark, path)).collect()[0]
    assert (row["r_numer"], row["r_denom"]) == (-4, 8)
    assert row["r_micro"] == -500_000


def _tri(p):
    return [(p + "1", p + "2"), (p + "2", p + "3"), (p + "1", p + "3")]


CHAIN4 = (_tri("a") + _tri("b") + _tri("c") + _tri("d")
          + [("a1", "b1"), ("a2", "b2"), ("c1", "d1"), ("c2", "d2"),
             ("b3", "c3")])


def test_weighted_refine_matches_reference(spark):
    wedges = [("a", "a", 8), ("a", "c", 1), ("c", "c", 8), ("c", "e", 6),
              ("e", "e", 2)]
    df = spark.createDataFrame(wedges, "src string, dst string, w long")
    got = {r["node"]: r["label"]
           for r in G.modularity_refine(df, rounds=3,
                                        weight_col="w").collect()}
    assert got == ref_refine(wedges, 3)


def test_contract_graph(spark):
    lab = _labels_df(spark, {"a1": "a1", "a2": "a1", "a3": "a1",
                             "b1": "b1", "b2": "b1", "b3": "b1"})
    edges = _edges_df(spark, _tri("a") + _tri("b") + [("a1", "b1")])
    got = sorted(tuple(r) for r in
                 G.contract_graph(edges, lab).collect())
    assert got == [("a1", "a1", 3), ("a1", "b1", 1), ("b1", "b1", 3)]


def test_louvain_two_levels_matches_reference(spark):
    for rounds in (1, 2):
        got = {r["node"]: r["label"]
               for r in G.louvain(_edges_df(spark, CHAIN4), levels=2,
                                  rounds=rounds).collect()}
        assert got == ref_louvain(CHAIN4, 2, rounds)


def test_louvain_level2_merges_bridged_triangles(spark):
    # rounds=1 per level under-merges at level 1; the contracted level
    # must finish the double-bridged pairs (a+b, c+d) without crossing
    # the single weak bridge b3-c3
    got = {r["node"]: r["label"]
           for r in G.louvain(_edges_df(spark, CHAIN4), levels=2,
                              rounds=3).collect()}
    left = {got[n] for n in ("a1", "a2", "a3", "b1", "b2", "b3")}
    right = {got[n] for n in ("c1", "c2", "c3", "d1", "d2", "d3")}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_charsets_incremental_equals_full(spark):
    from rdf_tabular_spark.kg.materialize import (
        characteristic_sets,
        characteristic_sets_from_state,
        characteristic_sets_incremental,
        charset_state,
    )

    t = "subj string, pred string, obj string"
    v1 = spark.createDataFrame(
        [("s1", "p", "1"), ("s1", "q", "2"), ("s2", "p", "1"),
         ("s3", "r", "9")], t)
    # delta: s1 loses q (charset shrinks), s2 gains r, s4 appears,
    # s3 vanishes entirely
    diff = spark.createDataFrame(
        [("removed", "s1", "q", "2"), ("added", "s2", "r", "5"),
         ("added", "s4", "p", "0"), ("removed", "s3", "r", "9")],
        "change string, subj string, pred string, obj string")
    v2 = spark.createDataFrame(
        [("s1", "p", "1"), ("s2", "p", "1"), ("s2", "r", "5"),
         ("s4", "p", "0")], t)
    got = sorted(tuple(r) for r in characteristic_sets_from_state(
        characteristic_sets_incremental(charset_state(v1), diff)).collect())
    want = sorted(tuple(r) for r in characteristic_sets(v2).collect())
    assert got == want


def test_eccentricity_probe_path_graph(spark):
    # path a-b-c-d-e: whatever the pivot, the double sweep lands on an
    # endpoint and reports the true diameter 4
    row = G.eccentricity_probe(_edges_df(spark, PATH5),
                               max_hops=8).collect()[0]
    assert row["ecc_peak"] == 4
    assert row["peak_node"] in ("a", "e")
    assert row["ecc_start"] <= row["ecc_peak"]


def test_star_cardinality_exact(spark):
    from rdf_tabular_spark.kg.materialize import (
        characteristic_sets,
        star_cardinality,
    )

    triples = spark.createDataFrame(
        [("s1", "p", "1"), ("s1", "q", "2"), ("s2", "p", "1"),
         ("s3", "p", "3"), ("s3", "q", "4"), ("s3", "r", "5")],
        "subj string, pred string, obj string")
    cs = characteristic_sets(triples)
    row = star_cardinality(cs, ["p", "q"]).collect()[0]
    # s1 {p,q} and s3 {p,q,r} carry both; their total triples = 2 + 3
    assert (row["star_subjects"], row["covered_triples"]) == (2, 5)
    empty = star_cardinality(cs, ["zz"]).collect()[0]
    assert (empty["star_subjects"], empty["covered_triples"]) == (0, 0)


def ref_wsssp(wedges, source, max_hops):
    """Bounded Bellman-Ford replay: min total weight over ≤max_hops
    edges, parallel edges collapsed to their cheapest."""
    emin = {}
    for a, b, w in wedges:
        emin[(a, b)] = min(emin.get((a, b), w), w)
    best = {source: 0}
    for _ in range(max_hops):
        nxt = dict(best)
        for (a, b), w in emin.items():
            if a in best and best[a] + w < nxt.get(b, float("inf")):
                nxt[b] = best[a] + w
        if nxt == best:
            break
        best = nxt
    return best


_wedge_st = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5), st.integers(0, 9)).map(
        lambda t: (f"n{t[0]}", f"n{t[1]}", t[2])),
    min_size=1, max_size=12)


@settings(max_examples=12, deadline=None)
@given(wedges=_wedge_st, hops=st.integers(1, 4))
def test_wsssp_fuzz_matches_reference(spark, wedges, hops):
    df = spark.createDataFrame(wedges, "src string, dst string, w long")
    got = {r["node"]: r["dist"]
           for r in G.weighted_sssp(df, "n0", max_hops=hops).collect()}
    assert got == ref_wsssp(wedges, "n0", hops)
