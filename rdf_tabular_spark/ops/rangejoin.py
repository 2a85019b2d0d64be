"""Range joins (point-in-interval, interval-overlap) via bucket banding.

Spark plans an inequality-only join as BroadcastNestedLoopJoin — at
100 TB that is all-pairs and dead on arrival. The classic fix (the same
one behind Databricks' range-join bins and every time-series engine's
chunked interval index) is to quantize the range dimension into
fixed-width buckets so the join becomes an EQUI-join on the bucket id,
with the exact inequality as a post-filter:

- a point lives in exactly ONE bucket, so point-in-interval emits no
  duplicates by construction;
- an interval covers ``ceil(span / width)`` buckets — the explode
  factor is bounded by the longest interval over the chosen width, a
  knob the caller sizes to the data (width ~= median span keeps the
  factor ~2);
- for interval×interval, a candidate pair shares every bucket both
  cover, so each pair is emitted ONCE by the ownership rule: only the
  bucket containing ``greatest(a.lo, b.lo)`` (the overlap's left edge)
  reports it — no dedup shuffle afterwards.

All arithmetic is integer bucket math on epoch seconds — pure column
expressions, one equi-join shuffle on (bucket), AQE handles skewed hot
buckets (a flash-crowd hour) with skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, width: int):
    # cast through timestamp: TIMESTAMP_NTZ (pandas-written parquet)
    # rejects a direct ->double cast, numerics round-trip unchanged, and
    # DATE gains the epoch-seconds semantics the arithmetic expects
    # (same shape as the as-of join's tolerance fix)
    return F.floor(col.cast("timestamp").cast("double") / width).cast("long")


def point_in_interval_join(points: DataFrame, intervals: DataFrame,
                           point_ts: str, lo: str, hi: str,
                           bucket_width: int = 3600) -> DataFrame:
    """All (point, interval) pairs with ``lo <= point_ts <= hi``
    (timestamps; *bucket_width* in seconds).

    The interval side explodes into its covered buckets (bounded by
    span/width); the point side maps to its single bucket; one equi-join
    on the bucket id + the exact BETWEEN filter. No duplicate pairs: a
    point is in exactly one bucket."""
    p = points.withColumn("_b", _bucket(F.col(point_ts), bucket_width))
    iv = intervals.withColumn(
        "_b", F.explode(F.sequence(
            _bucket(F.col(lo), bucket_width),
            _bucket(F.col(hi), bucket_width))))
    joined = p.join(iv, "_b").filter(
        F.col(point_ts).between(F.col(lo), F.col(hi)))
    return joined.drop("_b")


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          lo_a: str, hi_a: str, lo_b: str, hi_b: str,
                          bucket_width: int = 3600) -> DataFrame:
    """All (a, b) pairs whose intervals overlap
    (``lo_a <= hi_b AND lo_b <= hi_a``).

    Both sides explode into covered buckets; the pair is emitted only by
    the bucket that owns the overlap's left edge
    (``greatest(lo_a, lo_b)``), so every overlapping pair appears
    exactly once without a dedup pass."""
    a = left.withColumn(
        "_b", F.explode(F.sequence(
            _bucket(F.col(lo_a), bucket_width),
            _bucket(F.col(hi_a), bucket_width))))
    b = right.withColumn(
        "_b", F.explode(F.sequence(
            _bucket(F.col(lo_b), bucket_width),
            _bucket(F.col(hi_b), bucket_width))))
    joined = a.join(b, "_b").filter(
        (F.col(lo_a) <= F.col(hi_b)) & (F.col(lo_b) <= F.col(hi_a)))
    owner = _bucket(F.greatest(F.col(lo_a), F.col(lo_b)), bucket_width)
    return joined.filter(F.col("_b") == owner).drop("_b")
