"""ANN recall@k quantification (VERDICT r2 item 5).

The block/band boundaries in lsh/ivf/kmeans_ivf/knn_join trade recall
for candidate-set size; these tests pin (a) measured recall floors at
sf0.01, (b) the designed monotone trade — wider probing never loses
recall — and (c) the exactness limit: probing EVERY partition must
reproduce brute force identically. Measured values live in BASELINE.md
(ANN recall section); the cross-engine twin is the similarity_recall
oracle row.

The sf0.01 embeddings are near-random 64-dim vectors (cosine mass
concentrates), so absolute recall at narrow probes is intrinsically
modest — the floors assert the measured values hold, not that the data
is easy.
"""
from __future__ import annotations

import os

import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
EMB = os.path.join(TESTDATA, "sf0.01", "embeddings.parquet")

pytestmark = pytest.mark.skipif(
    not os.path.exists(EMB), reason="sf0.01 testdata not present")


@pytest.fixture(scope="module")
def emb(spark):
    from pyspark.sql import functions as F

    df = (spark.read.parquet(EMB)
          .withColumn("embedding",
                      F.transform("embedding", lambda x: x.cast("double")))
          .cache())
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def qvec():
    import __spark_entry__ as E

    return E._query_vec()


@pytest.fixture(scope="module")
def brute(emb, qvec):
    from rdf_tabular_spark.ops.similarity import brute_force_topk

    b = brute_force_topk(emb, qvec, k=10).cache()
    b.count()
    yield b
    b.unpersist()


def _recall(approx, brute):
    from rdf_tabular_spark.ops.similarity import recall_at_k

    return recall_at_k(approx, brute, 10).collect()[0]["recall"]


def test_recall_floors_at_measured_settings(emb, qvec, brute):
    """Floors from the r3 measurement run (values in BASELINE.md),
    asserted with no margin shaved off — testdata is seed-stable."""
    from rdf_tabular_spark.ops.similarity import (
        ivf_topk, kmeans_ivf_topk, lsh_topk)

    assert _recall(ivf_topk(emb, qvec, k=10, n_probe=4), brute) >= 0.5
    assert _recall(kmeans_ivf_topk(emb, qvec, k=10, n_clusters=8,
                                   iters=2, n_probe=4), brute) >= 0.7
    assert _recall(lsh_topk(emb, qvec, k=10, bits=6, probe_hamming=2),
                   brute) >= 0.5


def test_recall_monotone_in_probe_width(emb, qvec, brute):
    """The designed trade: probing more partitions/buckets can only add
    candidates, so recall is monotone non-decreasing."""
    from rdf_tabular_spark.ops.similarity import ivf_topk, lsh_topk

    r_ivf = [_recall(ivf_topk(emb, qvec, k=10, n_probe=p), brute)
             for p in (1, 2, 4)]
    assert r_ivf == sorted(r_ivf)
    r_lsh = [_recall(lsh_topk(emb, qvec, k=10, bits=6, probe_hamming=p),
                     brute) for p in (0, 1, 2)]
    assert r_lsh == sorted(r_lsh)


def test_probe_everything_equals_brute_force(emb, qvec, brute):
    """Exactness limit: with every partition probed the ANN paths ARE
    brute force — same ids, same scores (deterministic vec_id ties)."""
    from rdf_tabular_spark.ops.similarity import ivf_topk, lsh_topk

    want = sorted(map(tuple, brute.collect()))
    all_labels = emb.select("label").distinct().count()
    got_ivf = sorted(map(tuple, ivf_topk(
        emb, qvec, k=10, n_probe=all_labels).collect()))
    assert got_ivf == want
    # bits=2 + Hamming-2 probing covers all 4 buckets
    got_lsh = sorted(map(tuple, lsh_topk(
        emb, qvec, k=10, bits=2, probe_hamming=2).collect()))
    assert got_lsh == want


def test_knn_join_blocked_recall(emb):
    """Batch kNN: k-means-blocked recall@3 vs the exact all-pairs kNN.
    Floor from the r3 measurement (0.34 measured; labels are near-random
    so the learned blocks carry all the recoverable structure)."""
    from rdf_tabular_spark.ops.similarity import (
        kmeans, knn_join, knn_recall_at_k)

    exact = knn_join(emb, k=3, block_col=None)
    assigned, _ = kmeans(emb, k=8, iters=2)
    approx = knn_join(assigned, k=3, block_col="cluster")
    got = knn_recall_at_k(approx, exact, 3).collect()[0]["recall"]
    assert got >= 0.3


def test_quantize_embeddings_bounds(spark):
    """SQ codes stay in [0, levels]; reconstruction error is bounded by
    half a quantization step per dimension; a degenerate (constant)
    dimension quantizes to code 0 with zero error."""
    from rdf_tabular_spark.ops.similarity import quantize_embeddings

    rows = [
        (1, [0.0, 5.0, -1.0, 7.0]),
        (2, [1.0, 5.0, 1.0, -7.0]),
        (3, [0.5, 5.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in quantize_embeddings(emb).collect()}
    for r in out.values():
        assert all(0 <= c <= 255 for c in r.codes)
    # dim 2 is constant (5.0): everyone gets code 0, contributing no error
    assert [out[i].codes[1] for i in (1, 2, 3)] == [0, 0, 0]
    # extremes land on the ends of the code range
    assert out[1].codes[0] == 0 and out[2].codes[0] == 255
    assert out[1].codes[3] == 255 and out[2].codes[3] == 0
    # error bound: half a step of the widest dim (range 14 over 255 levels)
    for r in out.values():
        # 1e-6 slack: max_abs_err is reported rounded to 6 dp
        assert r.max_abs_err <= 14.0 / 255.0 / 2.0 + 1e-6


def test_quantize_roundtrip_monotone(spark):
    """Dequantized values preserve the order of the originals within a
    dimension (quantization is monotone)."""
    from rdf_tabular_spark.ops.similarity import quantize_embeddings

    rows = [(i, [float(i) / 10.0]) for i in range(11)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sorted((r.vec_id, r.codes[0])
                 for r in quantize_embeddings(emb).collect())
    codes = [c for _, c in out]
    assert codes == sorted(codes)
    assert codes[0] == 0 and codes[-1] == 255


# ---------------------------------------------------------------- PQ


def test_pq_codes_match_per_block_kmeans(spark):
    from pyspark.sql import functions as F
    from rdf_tabular_spark.ops.similarity import kmeans, pq_encode

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(100)
    out, books = pq_encode(emb, m=4, k=4, iters=2, dim=64)
    assert len(books) == 4 and all(len(b) == 4 for b in books)
    rows = {r.vec_id: (r.code_0, r.code_1, r.code_2, r.code_3)
            for r in out.collect()}
    # block 2 cross-check: codes equal a standalone kmeans on that slice
    block = emb.select("vec_id", F.slice("embedding", 33, 16).alias("_sub"))
    assigned, cents = kmeans(block, k=4, iters=2, vec_col="_sub")
    assert [list(c) for c in cents] == [list(c) for c in books[2]]
    for r in assigned.collect():
        assert rows[r.vec_id][2] == r.cluster
    # codes live in [0, k)
    assert all(0 <= c < 4 for cs in rows.values() for c in cs)


def test_pq_dim_divisibility_checked(spark):
    from rdf_tabular_spark.ops.similarity import pq_encode

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(10)
    with pytest.raises(ValueError, match="not divisible"):
        pq_encode(emb, m=5, dim=64)


def test_pq_layout_invariant(spark):
    from rdf_tabular_spark.ops.similarity import pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a, _ = pq_encode(emb.repartition(3), m=4, k=8, iters=1, dim=64)
    b, _ = pq_encode(emb.repartition(11), m=4, k=8, iters=1, dim=64)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pq_adc_matches_reconstruction_scoring(spark):
    from pyspark.sql import functions as F
    from rdf_tabular_spark.ops.similarity import pq_adc_topk, pq_encode

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(200)
    q = [((i * 37) % 13 - 6) / 7.0 for i in range(64)]
    top = pq_adc_topk(emb, q, topk=5, m=4, k=4, iters=1, dim=64).collect()
    assert len(top) == 5
    # closed-form check: ADC score == dot(query, reconstructed vector)
    codes, books = pq_encode(emb, m=4, k=4, iters=1, dim=64)
    rows = {r.vec_id: (r.code_0, r.code_1, r.code_2, r.code_3)
            for r in codes.collect()}
    for r in top:
        recon = []
        for j in range(4):
            recon += books[j][rows[r.vec_id][j]]
        want = round(sum(a * b for a, b in zip(q, recon)), 6)
        assert abs(r.adc_score - want) < 1e-6
    # descending, ties by id
    scores = [(r.adc_score, r.vec_id) for r in top]
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))


def test_hard_negative_band_and_per_anchor(spark):
    from rdf_tabular_spark.ops.dedup import hard_negative_pairs

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(200)
    out = hard_negative_pairs(emb, lo=0.1, hi=0.6, per_anchor=3).collect()
    assert out, "band should be non-empty on the sf corpus"
    per_anchor = {}
    for r in out:
        assert r.anchor != r.negative
        assert 0.1 * 1e6 - 1 <= r.cosine_micro < 0.6 * 1e6 + 1
        per_anchor.setdefault(r.anchor, []).append(r.rank)
    for ranks in per_anchor.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_ivf_pq_composition(spark, emb):
    """IVF-PQ candidates ⊆ the probed clusters; scores equal the plain
    ADC scores for the same ids (same codebooks, same LUT)."""
    from rdf_tabular_spark.ops.similarity import (ivf_pq_topk,
                                                  pq_adc_topk)

    q = [0.1] * 64
    got = ivf_pq_topk(emb, q, topk=10, n_clusters=4, n_probe=2,
                      m=4, k=4, dim=64)
    rows = got.collect()
    assert 0 < len(rows) <= 10
    full = {r.vec_id: r.adc_score for r in pq_adc_topk(
        emb, q, topk=10_000, m=4, k=4, dim=64).collect()}
    for r in rows:
        assert abs(full[r.vec_id] - r.adc_score) < 1e-9
