"""Deterministic random walks + skip-gram pairs (kg/walks.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from rdf_tabular_spark.kg.walks import random_walks, skipgram_pairs

EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
         ("b", "a"), ("d", "a")]


def _edges(spark, parts=2):
    return spark.createDataFrame(EDGES, "src string, dst string") \
        .repartition(parts)


def _walks_py(length, walks_per_node, seed):
    """Driver-side reference: same md5 convention, plain Python."""
    from collections import defaultdict
    adj = defaultdict(list)
    for s, d in sorted(set(EDGES)):
        if d not in adj[s]:
            adj[s].append(d)
    for s in adj:
        adj[s] = sorted(set(adj[s]))
    out = {}
    for start in sorted({s for s, _ in EDGES}):
        for w in range(walks_per_node):
            path = [start]
            cur = start
            for t in range(1, length):
                nbrs = adj.get(cur, [])
                if nbrs:
                    h = hashlib.md5(
                        f"{start}|{w}|{t}|{cur}|{seed}".encode()
                    ).hexdigest()
                    cur = nbrs[int(h[:8], 16) % len(nbrs)]
                    path.append(cur)
            out[(start, w)] = "|".join(path)
    return out


def test_matches_python_reference(spark):
    got = {(r.start, r.walk): r.path
           for r in random_walks(_edges(spark), length=5,
                                 walks_per_node=3, seed=11).collect()}
    assert got == _walks_py(5, 3, 11)


def test_partitioning_invariant(spark):
    a = random_walks(_edges(spark, 1), length=4, walks_per_node=2,
                     seed=3).collect()
    b = random_walks(_edges(spark, 7), length=4, walks_per_node=2,
                     seed=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_paths_follow_edges(spark):
    es = set(EDGES)
    for r in random_walks(_edges(spark), length=6,
                          walks_per_node=2, seed=0).collect():
        nodes = r.path.split("|")
        assert nodes[0] == r.start and nodes[-1] == r.end
        for u, v in zip(nodes, nodes[1:]):
            assert (u, v) in es


def test_sink_freezes(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "z")],
                              "src string, dst string")
    got = {r.start: r.path
           for r in random_walks(e, length=5, walks_per_node=1,
                                 seed=0).collect()}
    assert got["a"] == "a|b|z"   # z has no out-edges: frozen early
    assert got["b"] == "b|z"


def test_explicit_starts(spark):
    starts = spark.createDataFrame([("a",)], "node string")
    rows = random_walks(_edges(spark), length=3, walks_per_node=4,
                        seed=0, starts=starts).collect()
    assert len(rows) == 4
    assert all(r.start == "a" for r in rows)


def test_seed_changes_walks(spark):
    a = {(r.start, r.walk): r.path
         for r in random_walks(_edges(spark), length=6,
                               walks_per_node=2, seed=0).collect()}
    b = {(r.start, r.walk): r.path
         for r in random_walks(_edges(spark), length=6,
                               walks_per_node=2, seed=99).collect()}
    assert a != b


def test_skipgram_counts_match_reference(spark):
    walks = random_walks(_edges(spark), length=5, walks_per_node=2,
                         seed=1)
    got = {(r.center, r.context): r.n
           for r in skipgram_pairs(walks, window=2).collect()}
    ref = {}
    for path in _walks_py(5, 2, 1).values():
        toks = path.split("|")
        for i, c in enumerate(toks):
            for j in range(max(0, i - 2), min(len(toks), i + 3)):
                if j != i:
                    ref[(c, toks[j])] = ref.get((c, toks[j]), 0) + 1
    assert got == ref


def test_skipgram_no_cross_walk_pairs(spark):
    # two length-1 paths (isolated starts): no pairs at all
    e = spark.createDataFrame([("q", "q2")], "src string, dst string")
    starts = spark.createDataFrame([("x",), ("y",)], "node string")
    walks = random_walks(e, length=3, walks_per_node=1, seed=0,
                         starts=starts)
    assert skipgram_pairs(walks, window=2).count() == 0


def test_ppmi_matches_reference(spark):
    import math
    from rdf_tabular_spark.kg.walks import ppmi_features

    walks = random_walks(_edges(spark), length=5, walks_per_node=2,
                         seed=1)
    pairs = skipgram_pairs(walks, window=2)
    got = {(r.center, r.context): (r.pmi_micro, r.rank)
           for r in ppmi_features(pairs, top_k=3).collect()}

    cnt = {(r.center, r.context): r.n for r in pairs.collect()}
    N = sum(cnt.values())
    ncs, nxs = {}, {}
    for (c, x), n in cnt.items():
        ncs[c] = ncs.get(c, 0) + n
        nxs[x] = nxs.get(x, 0) + n
    ref = {}
    for (c, x), n in cnt.items():
        p = round((math.log(n) + math.log(N) - math.log(ncs[c])
                   - math.log(nxs[x])) * 1e6)
        if p > 0:
            ref.setdefault(c, []).append((-p, x))
    want = {}
    for c, lst in ref.items():
        for rank, (negp, x) in enumerate(sorted(lst)[:3], 1):
            want[(c, x)] = (-negp, rank)
    assert got == want


def test_ppmi_positive_only_and_bounded(spark):
    from rdf_tabular_spark.kg.walks import ppmi_features

    pairs = skipgram_pairs(random_walks(_edges(spark), length=5,
                                        walks_per_node=2, seed=1),
                           window=2)
    rows = ppmi_features(pairs, top_k=2).collect()
    assert all(r.pmi_micro > 0 for r in rows)
    from collections import Counter
    per = Counter(r.center for r in rows)
    assert all(v <= 2 for v in per.values())


def _n2v_py(edges, length, walks_per_node, p, q, seed):
    from collections import defaultdict
    wr, wn, wf = round(1e6 / p), 1_000_000, round(1e6 / q)
    adj = defaultdict(list)
    for s, d in sorted(set(edges)):
        adj[s].append(d)
    eset = set(edges)
    out = {}
    for start in sorted({s for s, _ in edges}):
        for w in range(walks_per_node):
            path, cur, prev = [start], start, None
            for t in range(1, length):
                nbrs = adj.get(cur, [])
                if not nbrs:
                    continue
                if t == 1:
                    weights = [1] * len(nbrs)
                else:
                    weights = [wr if x == prev
                               else wn if (prev, x) in eset
                               else wf for x in nbrs]
                tot = sum(weights)
                h = hashlib.md5(
                    f"{start}|{w}|{t}|{cur}|{seed}".encode()).hexdigest()
                draw = int(h[:8], 16) % tot
                cum = 0
                for x, wt in zip(nbrs, weights):
                    cum += wt
                    if draw < cum:
                        nxt = x
                        break
                prev, cur = cur, nxt
                path.append(nxt)
            out[(start, w)] = "|".join(path)
    return out


TRI = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("a", "c"),
       ("c", "a"), ("c", "d"), ("d", "c")]


def test_node2vec_matches_python_reference(spark):
    from rdf_tabular_spark.kg.walks import node2vec_walks

    e = spark.createDataFrame(TRI, "src string, dst string")
    for p, q in ((4.0, 0.25), (0.5, 2.0), (1.0, 1.0)):
        got = {(r.start, r.walk): r.path
               for r in node2vec_walks(e, length=5, walks_per_node=2,
                                       p=p, q=q, seed=9).collect()}
        assert got == _n2v_py(TRI, 5, 2, p, q, 9), (p, q)


def test_node2vec_first_step_matches_first_order(spark):
    from rdf_tabular_spark.kg.walks import node2vec_walks

    e = spark.createDataFrame(TRI, "src string, dst string")
    a = {(r.start, r.walk): r.path.split("|")[1]
         for r in node2vec_walks(e, length=2, walks_per_node=3,
                                 p=9.0, q=0.1, seed=4).collect()}
    b = {(r.start, r.walk): r.path.split("|")[1]
         for r in random_walks(e, length=2, walks_per_node=3,
                               seed=4).collect()}
    assert a == b


def test_node2vec_partitioning_invariant_and_valid(spark):
    from rdf_tabular_spark.kg.walks import node2vec_walks

    e1 = spark.createDataFrame(TRI, "src string, dst string")
    e7 = e1.repartition(7)
    a = sorted(map(tuple, node2vec_walks(
        e1, length=4, walks_per_node=2, p=2.0, q=0.5,
        seed=0).collect()))
    b = sorted(map(tuple, node2vec_walks(
        e7, length=4, walks_per_node=2, p=2.0, q=0.5,
        seed=0).collect()))
    assert a == b
    es = set(TRI)
    for start, w, path, end in a:
        nodes = path.split("|")
        assert nodes[0] == start and nodes[-1] == end
        for u, v in zip(nodes, nodes[1:]):
            assert (u, v) in es


def test_node2vec_sink_freezes(spark):
    from rdf_tabular_spark.kg.walks import node2vec_walks

    e = spark.createDataFrame([("a", "b"), ("b", "z")],
                              "src string, dst string")
    got = {r.start: r.path for r in node2vec_walks(
        e, length=6, walks_per_node=1, p=1.0, q=1.0,
        seed=0).collect()}
    assert got["a"] == "a|b|z"
