"""Similarity search over an embedding column (array<float>).

- :func:`brute_force_topk` — exact cosine top-k (the correctness baseline;
  also the right tool under ~10^6 vectors: one scan, no index).
- :func:`lsh_topk` — random-hyperplane (SRP) LSH bucketing: each vector
  lands in a small number of buckets; the query probes its own bucket(s)
  only. The scale path: candidate set ≈ n / 2^bits per table.
- :func:`ivf_topk` — IVF-style: coarse partition by a provided cluster id
  (label column or k-means assignment), probe the nearest partitions.

All dot products are ``zip_with`` + ``aggregate`` higher-order expressions —
JVM-side, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import cosine_sim


def _query_lit(qv: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in qv])


def brute_force_topk(
    emb: DataFrame, query: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine. orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heap + driver merge of k rows — no global sort shuffle)."""
    scored = emb.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), _query_lit(query)), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def srp_signature(vec: Column, dim: int, bits: int = 8, seed: int = 7) -> Column:
    """Signed-random-projection bucket id: bit b = sign(<v, r_b>) where r_b
    is a deterministic ±1 vector derived from hash(seed, b, i)."""
    import hashlib

    def rademacher(b: int) -> list[int]:
        out = []
        for i in range(dim):
            h = hashlib.sha256(f"{seed}|{b}|{i}".encode()).digest()[0]
            out.append(1 if h % 2 == 0 else -1)
        return out

    bit_exprs = []
    for b in range(bits):
        r = rademacher(b)
        dot = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in r]),
                       lambda x, y: (x * y).cast("double")),
            F.lit(0.0), lambda acc, x: acc + x)
        bit_exprs.append(F.when(dot >= 0, F.lit(1 << b)).otherwise(F.lit(0)))
    sig = bit_exprs[0]
    for e in bit_exprs[1:]:
        sig = sig + e
    return sig.cast("int")


def lsh_topk(
    emb: DataFrame, query: list[float], k: int = 10, bits: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: probe the query's SRP bucket and its Hamming-1
    neighbors, exact-rescore candidates only."""
    dim = len(query)
    bucketed = emb.withColumn("bucket", srp_signature(F.col(vec_col), dim, bits))

    # query bucket computed on the driver with the same hash construction
    import hashlib

    qsig = 0
    for b in range(bits):
        dot = 0.0
        for i in range(dim):
            h = hashlib.sha256(f"7|{b}|{i}".encode()).digest()[0]
            dot += query[i] * (1 if h % 2 == 0 else -1)
        if dot >= 0:
            qsig |= 1 << b
    probes = {qsig}
    if probe_hamming >= 1:
        probes |= {qsig ^ (1 << b) for b in range(bits)}

    cands = bucketed.filter(F.col("bucket").isin(*sorted(probes)))
    scored = cands.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), _query_lit(query)), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def ivf_topk(
    emb: DataFrame, query: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    cluster_col: str = "label", n_probe: int = 2,
) -> DataFrame:
    """IVF: rank coarse partitions by centroid similarity, exact-search the
    best n_probe partitions. Centroids via one map-side-combined agg."""
    dim = len(query)
    centroids = (
        emb.groupBy(cluster_col)
        .agg(F.array(*[
            F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"c{i}")
            for i in range(dim)
        ]).alias("centroid"))
    )
    top_clusters = [
        r[0] for r in centroids.select(
            cluster_col,
            cosine_sim(F.col("centroid"), _query_lit(query)).alias("sim"))
        .orderBy(F.desc("sim")).limit(n_probe).collect()
    ]
    cands = emb.filter(F.col(cluster_col).isin(top_clusters))
    scored = cands.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), _query_lit(query)), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)
