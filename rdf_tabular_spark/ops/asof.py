"""As-of (point-in-time) join — the temporal operator Spark lacks.

For every left row, attach the LATEST right row with the same key whose
time is at or before the left row's time ("backward" as-of; the shape of
price-at-trade-time, feature-at-event-time, config-at-run-time lookups).

Implementation is the union + window trick, not a range join:

    tag both sides -> union -> window PARTITION BY key
      ORDER BY (time, side) -> carry last(right-payload struct,
      ignorenulls) -> keep left rows

One shuffle on the join key, a per-key local (spillable) sort, zero row
blowup — a naive ``l.t >= r.t`` range join materializes O(|matches|)
pairs per key before picking the max, which at billions of events per
key is the difference between a job and an outage. The right payload is
carried as a STRUCT so a legitimately-NULL right value cannot be
skipped by ``last(..., ignorenulls=True)`` in favor of an older row.

Ordering details that make the semantics exact:

- at equal times the right row sorts BEFORE the left row (side tag
  0 < 1), so "at or before" includes ties;
- the right side must be unique per (key, time) — duplicate timestamps
  have no defined winner in any as-of engine; pre-dedupe (e.g. with
  text.top_k_per_group) or the result is nondeterministic.

Skew note: a pathologically hot key serializes into one window
partition. For that regime pre-bucket time into coarse ranges and run a
bucketed range join instead; for event-per-user-shaped data the window
form is the right default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame, right: DataFrame, on: list[str] | str,
    left_time: str, right_time: str, right_values: list[str],
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left rows + the latest *right_values* at or before *left_time*
    per *on* key (NULLs when no prior right row exists — left-join
    semantics). *tolerance_seconds* bounds the lookback: matches older
    than the tolerance are dropped (their values go back to NULL)."""
    keys = [on] if isinstance(on, str) else list(on)
    # a NULL right time would sort NULLS FIRST and be carried as a
    # phantom "prior" match (DuckDB's native ASOF matches nothing for
    # NULL times — review r2); such rows can never satisfy t >= rt
    right = right.filter(F.col(right_time).isNotNull())
    payload = F.struct(
        F.col(right_time).alias("_rt"),
        *[F.col(c) for c in right_values])
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
    )
    l = left.withColumn("_t", F.col(left_time)).withColumn(
        "_side", F.lit(1))
    combined = l.unionByName(r, allowMissingColumns=True)
    w = (Window.partitionBy(*keys).orderBy("_t", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = combined.withColumn(
        "_carry", F.last("_payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        # DATE (and TIMESTAMP) columns reject a direct ->double cast;
        # route temporal types through TIMESTAMP first so the
        # tolerance arithmetic is uniformly in seconds (ADVICE r2).
        def _seconds(col: F.Column, dtype: str) -> F.Column:
            if dtype.startswith(("date", "timestamp")):
                return col.cast("timestamp").cast("double")
            return col.cast("double")

        lt = dict(left.dtypes)[left_time]
        rt = dict(right.dtypes)[right_time]
        fresh = (
            _seconds(F.col("_t"), lt)
            - _seconds(F.col("_carry._rt"), rt)) <= tolerance_seconds
        out = out.withColumn(
            "_carry", F.when(fresh, F.col("_carry")))
    return out.select(
        *[c for c in left.columns],
        *[F.col(f"_carry.{v}").alias(v) for v in right_values],
        F.col("_carry._rt").alias("asof_time"),
    )
