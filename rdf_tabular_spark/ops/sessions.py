"""Event sessionization: split each user's event stream into sessions at
inactivity gaps, then aggregate per session.

The reference is a batch tabular→RDF mapper with no temporal operators
(SURVEY.md §2.8); this is part of the engine's large-scale analytics
extension alongside the streaming window aggregates.

Scale shape: everything is windowed ``partitionBy(user_id)`` — one hash
shuffle of (user, ts, type, value) and a per-user local sort; there is no
global ordering and no self-join.  Skewed power users are bounded by the
events a single user can physically produce (a per-key local sort over at
most millions of rows spills, not OOMs); for adversarial key skew route
through ``salted_agg_count``-style pre-splitting instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sessionized(events: DataFrame, gap_s: int, user_col: str,
                 ts_col: str) -> DataFrame:
    """Internal: events + ``session_id`` + the ``_es`` epoch-seconds
    helper column (kept for span aggregation in session_stats)."""
    # NTZ timestamps can't cast straight to long; route through TIMESTAMP
    # (session tz is pinned UTC everywhere in this engine)
    staged = events.withColumn(
        "_es", F.col(ts_col).cast("timestamp").cast("long"))
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag("_es").over(w)
    new_session = F.when(
        prev.isNull() | (F.col("_es") - prev > gap_s), 1).otherwise(0)
    return staged.withColumn(
        "session_id",
        (F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1
         ).cast("long"))


def sessionize(events: DataFrame, gap_s: int = 1800,
               user_col: str = "user_id",
               ts_col: str = "ts") -> DataFrame:
    """Adds ``session_id`` (0-based per user, in time order) to each event.

    A new session starts when the gap to the previous event of the same
    user exceeds ``gap_s`` seconds (classic lag → boundary-flag → running
    sum; the Structured Streaming twin of this semantics is
    ``F.session_window(ts, gap)``).  Gap comparison is on whole epoch
    seconds (timestamp→long truncates), pinning sub-second ties to one
    portable answer.  Output = input columns + ``session_id`` only."""
    return _sessionized(events, gap_s, user_col, ts_col).drop("_es")


def session_stats(events: DataFrame, gap_s: int = 1800,
                  user_col: str = "user_id",
                  ts_col: str = "ts",
                  value_col: str | None = "value",
                  type_col: str | None = "event_type") -> DataFrame:
    """Per-session rollup: event count, span seconds, and (when the
    corresponding column name is not None) value sum and distinct event
    types.  One extra hash aggregation on (user, session) — already
    co-partitioned with the sessionize shuffle, so AQE coalesces it into
    a local agg in practice."""
    s = _sessionized(events, gap_s, user_col, ts_col)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.max("_es") - F.min("_es")).cast("long").alias("span_s")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 6).alias("value_sum"))
    if type_col is not None:
        aggs.append(
            F.count_distinct(type_col).cast("long").alias("n_types"))
    return s.groupBy(user_col, "session_id").agg(*aggs)


def session_window_stats(events: DataFrame, gap_s: int = 1800,
                         user_col: str = "user_id", ts_col: str = "ts",
                         value_col: str = "value",
                         ts_prepared: bool = False) -> DataFrame:
    """Native ``F.session_window`` sessionization — the
    streaming-compatible path: the identical expression runs unchanged
    under ``readStream`` + watermark, where per-key session state is
    merged incrementally instead of a partition sort (SURVEY §2.8
    extension; no lag/running-sum window, so no per-user sort at all in
    streaming mode).

    Boundary parity with :func:`sessionize`: Spark merges an event into a
    session when it falls within ``[start, last + gap]`` INCLUSIVE (an
    event exactly ``gap`` after the last one still merges — verified
    against the islands formulation on real data), i.e. it closes at
    ``diff > gap`` exactly like the lag/running-sum formulation, so the
    same ``gap_s`` over second-truncated timestamps assigns IDENTICAL
    sessions (the equivalence the oracle row pins cross-engine).

    Returns (user, session_start_es, session_last_es, n_events,
    value_sum) — epoch-second session bounds of actual events, not the
    gap-padded window end.

    *ts_prepared*: the STREAMING entry path. A watermark attaches to a
    specific attribute and does not survive the internal cast/trunc
    projection, so a streaming caller pre-truncates
    (``date_trunc('second', CAST(ts AS TIMESTAMP))``), watermarks that
    column, and passes ``ts_prepared=True`` — the op then uses it
    verbatim and the identical aggregation runs incrementally."""
    gap = gap_s
    tcol = F.col(ts_col) if ts_prepared else F.date_trunc(
        "second", F.col(ts_col).cast("timestamp"))
    return (
        events.groupBy(
            F.col(user_col),
            F.session_window(tcol, f"{gap} seconds").alias("_w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
             F.round(F.sum(value_col), 6).alias("value_sum"))
        .select(
            user_col,
            F.col("_w.start").cast("long").alias("session_start_es"),
            (F.col("_w.end").cast("long") - gap).alias("session_last_es"),
            "n_events", "value_sum")
    )
