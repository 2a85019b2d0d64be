"""Ordered-funnel and cohort-retention analytics over the event
stream — the product-analytics pair every event pipeline ships
(sessionization's ops/sessions.py siblings).

Funnel semantics — STRICT ORDER, first qualifying occurrence: a user
converts through stage i only at the earliest event of stage i's type
that is strictly LATER than their stage i-1 conversion time. That is
the same earliest-arrival recurrence as ops/temporal.py, one
min-aggregation per stage over a per-user pre-aggregated table — no
window over the raw stream, no per-user sequence materialization:

    t_1(u) = min ts of type_1 events of u
    t_i(u) = min ts of type_i events of u with ts > t_{i-1}(u)

Retention semantics — classic weekly cohorts: a user's cohort is the
week of their FIRST event; retention counts distinct users of cohort
c active in week c+k, reported as (cohort_week, week_offset, users).

Both are two-shuffle shapes (user-keyed agg, then a bounded
stage/cohort-keyed agg) that survive any scale: the per-user state is
a handful of timestamps, and the outputs are |stages| and
|weeks × offsets| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_conversions", "funnel_counts", "retention_cohorts",
           "stage_event_arrays"]


def stage_event_arrays(events: DataFrame, stages: list[str], *,
                       user_col: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type") -> DataFrame:
    """One row per user with a SORTED event-time array per stage
    (column named after the stage; NULL when the user has none) —
    stage 1 needs only the min, later stages need "min ts > prev",
    which the sorted array answers without re-scanning the stream.
    Shared by the batch funnel and the streaming per-batch merge."""
    pre = (events
           .filter(F.col(type_col).isin(stages))
           .groupBy(F.col(user_col).alias("user"),
                    F.col(type_col).alias("_t"))
           .agg(F.sort_array(F.collect_list(F.col(ts_col)))
                .alias("_ts")))
    return pre.groupBy("user").pivot("_t", stages).agg(F.first("_ts"))


def funnel_conversions(events: DataFrame, stages: list[str], *,
                       user_col: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type",
                       within_seconds: int | None = None) -> DataFrame:
    """Per-user conversion times ``(user, t_1 … t_n)`` for the ordered
    *stages*; ``t_i`` is NULL from the first stage the user never
    (subsequently) reached. One user-keyed aggregation per stage over
    the per-(user, type) min-ts table.

    *within_seconds* adds a conversion deadline: stage i counts only
    within that many seconds of stage i-1's conversion (the standard
    product-analytics funnel window). NOTE the greedy-earliest
    semantics shared with the unwindowed funnel: stage i-1 binds to
    its EARLIEST valid occurrence, it is not re-chosen to rescue a
    later stage i (matching Amplitude/Mixpanel "first occurrence"
    funnels)."""
    wide = stage_event_arrays(events, stages, user_col=user_col,
                              ts_col=ts_col, type_col=type_col)
    out = wide.withColumn("t_1", F.try_element_at(F.col(stages[0]),
                                                  F.lit(1)))
    for i, st in enumerate(stages[1:], start=2):
        prev = F.col(f"t_{i - 1}")
        # earliest element of the sorted array strictly after prev
        # (try_element_at: the filtered array may be empty — ANSI-safe)
        if within_seconds is None:
            nxt = F.filter(F.col(st), lambda x: x > prev)
        else:
            hi = F.timestamp_add("SECOND", F.lit(within_seconds), prev)
            nxt = F.filter(F.col(st),
                           lambda x: (x > prev) & (x <= hi))
        out = out.withColumn(
            f"t_{i}",
            F.when(prev.isNotNull(), F.try_element_at(nxt, F.lit(1))))
    return out.select("user", *[f"t_{i + 1}" for i in range(len(stages))])


def funnel_counts(events: DataFrame, stages: list[str], *,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """``(stage, stage_name, users)`` — how many users reached each
    funnel stage in order. The drop-off report."""
    conv = funnel_conversions(events, stages, user_col=user_col,
                              ts_col=ts_col, type_col=type_col)
    agg = conv.agg(*[
        F.count(F.col(f"t_{i + 1}")).alias(f"_c{i + 1}")
        for i in range(len(stages))])
    cells = ", ".join(
        f"{i + 1}, '{st}', _c{i + 1}" for i, st in enumerate(stages))
    return agg.select(F.expr(
        f"stack({len(stages)}, {cells}) AS (stage, stage_name, users)"))


def retention_cohorts(events: DataFrame, *, user_col: str = "user_id",
                      ts_col: str = "ts",
                      max_weeks: int = 12) -> DataFrame:
    """``(cohort_week, week_offset, users)`` — weekly cohort retention:
    cohort = Monday of the user's first-event week; users counted
    distinct per (cohort, offset) for offsets 0..max_weeks."""
    wk = F.date_trunc("week", F.col(ts_col))
    first = (events.groupBy(F.col(user_col).alias("user"))
             .agg(F.min(wk).alias("cohort_week")))
    active = (events.select(F.col(user_col).alias("user"),
                            wk.alias("_w")).distinct())
    return (active.join(first, "user")
            .withColumn("week_offset",
                        F.floor(
                            (F.col("_w").cast("long")
                             - F.col("cohort_week").cast("long"))
                            / (7 * 86400)).cast("int"))
            .filter(F.col("week_offset").between(0, max_weeks))
            .groupBy("cohort_week", "week_offset")
            .agg(F.countDistinct("user").alias("users")))
