"""Temporal-graph reachability: earliest-arrival over time-respecting
paths (Wu et al., VLDB'14 "Path Problems in Temporal Graphs") — the
contact-tracing / influence-propagation primitive: u reaches v only
through edges whose timestamps never decrease along the path.

Spark-first shape — label-correcting relaxation, the temporal analog
of kg/graph.py's semi-naive BFS:

- state = best-known ``(node, arrive)`` earliest arrival;
- per round, ONE equi-join of the state against the edge list on the
  source endpoint with the time-respecting filter ``ts >= arrive``,
  then a min-aggregation merged into the state; only IMPROVED rows
  re-enter the frontier, so per-round work tracks the wavefront, not
  the graph;
- arrival times are data values (timestamps), so the fixpoint is a
  pure min — deterministic under any partitioning and engine;
- ``max_hops`` bounds the rounds (and is part of the operator's
  declared semantics: "earliest arrival via ≤ max_hops hops"), the
  same pinned-round convention as the kcore/ktruss twins.

At 10^12 edges the edge list is hash-partitioned on ``src`` once and
every round reuses that layout; the state is |reachable nodes| —
frontier-sized joins, no global windows, no driver data loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["earliest_arrival", "latest_departure"]


def earliest_arrival(edges: DataFrame, sources: DataFrame, *,
                     max_hops: int = 4,
                     start_ts: str = "1900-01-01") -> DataFrame:
    """``(node, arrive)`` — earliest time each node can be reached from
    any source along a time-respecting path of ≤ *max_hops* edges.

    *edges* has columns ``(src, dst, ts)``; a path may take an edge
    only at ``ts >= `` its arrival at the edge's source. *sources*
    has column ``node``; sources start at ``start_ts`` (i.e. they may
    take any edge), and their own ``arrive`` in the output is
    ``start_ts``."""
    e = (edges.select("src", "dst", "ts").distinct()
         .repartition("src").localCheckpoint(eager=False))
    best = sources.select(
        "node", F.lit(start_ts).cast("timestamp").alias("arrive"))
    frontier = best
    for _ in range(max_hops):
        reached = (
            frontier.join(e, frontier["node"] == e["src"])
            .filter(F.col("ts") >= F.col("arrive"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("ts").alias("arrive")))
        merged = (best.unionByName(reached)
                  .groupBy("node").agg(F.min("arrive").alias("arrive"))
                  .localCheckpoint(eager=False))
        # only strictly-improved rows continue relaxing
        frontier = (merged.join(
            best.select("node", F.col("arrive").alias("_old")),
            "node", "left")
            .filter(F.col("_old").isNull()
                    | (F.col("arrive") < F.col("_old")))
            .select("node", "arrive"))
        if frontier.isEmpty():
            return merged
        best = merged
    return best


def latest_departure(edges: DataFrame, targets: DataFrame, *,
                     max_hops: int = 4,
                     deadline_ts: str = "2100-01-01") -> DataFrame:
    """``(node, depart)`` — the LATEST time one can leave each node and
    still reach a target along a time-respecting path of ≤ *max_hops*
    edges (Wu et al.'s latest-departure problem, the exact mirror of
    :func:`earliest_arrival`): relax backward with a MAX aggregation,
    taking edge ``(u, v, ts)`` only when ``ts <=`` v's known latest
    departure (you must still make the rest of the journey after
    arriving). Targets start at *deadline_ts*.

    Same shape as the forward problem: dst-keyed edge layout reused
    every round, one equi-join + max-agg, improved-rows-only frontier,
    pure max-of-timestamps fixpoint."""
    e = (edges.select("src", "dst", "ts").distinct()
         .repartition("dst").localCheckpoint(eager=False))
    best = targets.select(
        "node", F.lit(deadline_ts).cast("timestamp").alias("depart"))
    frontier = best
    for _ in range(max_hops):
        reached = (
            frontier.join(e, frontier["node"] == e["dst"])
            .filter(F.col("ts") <= F.col("depart"))
            .groupBy(F.col("src").alias("node"))
            .agg(F.max("ts").alias("depart")))
        merged = (best.unionByName(reached)
                  .groupBy("node").agg(F.max("depart").alias("depart"))
                  .localCheckpoint(eager=False))
        frontier = (merged.join(
            best.select("node", F.col("depart").alias("_old")),
            "node", "left")
            .filter(F.col("_old").isNull()
                    | (F.col("depart") > F.col("_old")))
            .select("node", "depart"))
        if frontier.isEmpty():
            return merged
        best = merged
    return best
