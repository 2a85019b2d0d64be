"""Graph set-semantics dedup (A3) + salted per-key aggregation.

An RDF graph is a *set* of triples; the final materialization dedups the
unioned per-table streams.

Scale note: ``dropDuplicates`` over the full triple is already skew-proof —
Catalyst plans it as a two-phase hash aggregate with map-side partial
combine, so a triple duplicated 10^9 times shuffles at most one row per
input partition. What DOES skew at 10^12 scale is per-key aggregation over
hot keys (triples-per-subject for a monorepo entity, LSH band buckets):
:func:`salted_agg_count` handles those with an explicit two-phase salted
aggregation (BASELINE.json north_rule: "salted aggregation for hot repos").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import TRIPLE_COLUMNS


def dedupe_triples(df: DataFrame) -> DataFrame:
    """Set-dedup a triple DataFrame (map-side-combined hash aggregate)."""
    return df.dropDuplicates(TRIPLE_COLUMNS)


def salted_agg_count(
    df: DataFrame, keys: list[str], salt_buckets: int = 64,
    count_alias: str = "n",
) -> DataFrame:
    """count() grouped by *keys*, two-phase with an explicit salt so no
    single reducer ever materializes a whole hot key.

    Phase 1 groups by (keys, salt=pmod(hash(all columns), B)) — B-way split
    of every key group; phase 2 sums the per-salt partials. Both phases are
    partial-aggregated map-side by Catalyst."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return phase1.groupBy(*keys).agg(F.sum("_partial").cast("long").alias(count_alias))
