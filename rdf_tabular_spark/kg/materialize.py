"""Final graph materialization: production tables + JSON serialization.

The north-star target shape is "Iceberg triple and entity tables plus an
rdf-tabular-compatible JSON serialization". The Iceberg *catalog* is an
environment non-goal (runtime jar absent in this sandbox — README), but
the layout decisions that matter at 100 TB are the writer's, and they go
through the same ``DataFrameWriter`` seam an Iceberg sink uses:

- the triple table is PARTITIONED BY ``pred``: the BGP layer
  (kg/query.py) pins constant predicates onto the scan, so a
  ``?s imports ?o`` pattern over a 100 TB triple table with ~40 distinct
  predicates reads only the matching partition directories (partition
  pruning), not the whole table;
- within each predicate partition, files are written sorted by ``subj``
  (``sortWithinPartitions``) so min/max footer stats make subject point
  lookups skip row groups;
- the entity table is small (vocabulary-sized) and lands as a plain
  sorted table.

The JSON serialization mirrors rdf-tabular's ``to_json`` row-object
shape (reader.rb to_json: one object per subject with predicate keys):
one JSON line per subject, predicates as keys, objects as sorted arrays.
One shuffle, keyed by subject; serialization is native ``to_json``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def materialize_graph(triples: DataFrame, entities: DataFrame,
                      path: str) -> dict[str, str]:
    """Write the final graph tables; returns the table paths."""
    t_path = os.path.join(path, "triples")
    e_path = os.path.join(path, "entities")
    (triples
     .repartition("pred")
     .sortWithinPartitions("subj", "obj")
     .write.mode("overwrite").partitionBy("pred").parquet(t_path))
    entities.sort("iri").write.mode("overwrite").parquet(e_path)
    return {"triples": t_path, "entities": e_path}


def subject_adjacency(triples: DataFrame) -> DataFrame:
    """(subj, pred, objs) with objects sorted and '|'-joined — the
    deterministic grouped form behind the JSON serialization (and its
    cross-engine oracle). One hash aggregation keyed by (subj, pred)."""
    return (
        triples.groupBy("subj", "pred")
        .agg(F.concat_ws("|", F.sort_array(F.collect_list("obj")))
             .alias("objs"))
    )


def graph_json_lines(triples: DataFrame) -> DataFrame:
    """One JSON line per subject: ``{"@id": subj, "<pred>": [objs...]}``
    with predicate keys and object arrays sorted (deterministic bytes).
    The rdf-tabular ``to_json`` analog for the assembled graph; feed to
    ``operators.json_rows.write_json_lines`` for the distributed sink."""
    per_pred = (
        triples.groupBy("subj", "pred")
        .agg(F.sort_array(F.collect_list("obj")).alias("objs")))
    # JSON-escape the bare subject string by serializing a 1-element
    # array and stripping the brackets (to_json only takes containers)
    subj_json = F.expr(
        "substring(to_json(array(subj)), 2, length(to_json(array(subj))) - 2)")
    return (
        per_pred.groupBy("subj")
        .agg(F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("pred", "objs"))))
            .alias("po"))
        .select(
            "subj",
            F.concat(
                F.lit('{"@id":'), subj_json,
                F.when(F.size("po") > 0, F.concat(F.lit(","),
                       F.regexp_replace(F.to_json(F.col("po")), r"^\{|\}$", "")))
                .otherwise(F.lit("")),
                F.lit("}"),
            ).alias("json"))
    )


def read_triples(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "triples"))


def characteristic_sets(triples: DataFrame) -> DataFrame:
    """Characteristic sets of the triple table (Neumann & Moerkotte,
    ICDE 2011): partition subjects by the exact SET of predicates they
    carry; one row per distinct predicate set with the number of
    subjects in the class and their total triple count. The structure
    behind accurate star-join cardinality estimation — the count of
    subjects whose characteristic set is a superset of a query star's
    predicates bounds the star's result — complementing the
    per-predicate independence estimator of kg/query.predicate_stats
    (reference analog: rdf-tabular has no statistics layer at all; this
    is the Spark-side catalog the north rule's 10^12-file graph needs).

    Set identity is the sorted '|'-joined predicate list — a
    deterministic, engine-portable group key. Two aggregations, both
    map-side combinable: (subj -> sorted distinct predicate list +
    count), then (list -> n_subjects, n_triples). No joins, no windows;
    the second agg's key domain is the number of DISTINCT predicate
    combinations (vocabulary-combinatorial, in practice thousands —
    Neumann's observation is that real datasets have few), so the
    reduce side is bounded regardless of triple count."""
    per_subj = triples.groupBy("subj").agg(
        F.concat_ws("|", F.sort_array(F.collect_set("pred"))).alias("char_set"),
        F.count(F.lit(1)).alias("n"))
    return (
        per_subj.groupBy("char_set").agg(
            F.count(F.lit(1)).alias("n_subjects"),
            F.sum("n").alias("n_triples"))
        .select(
            "char_set",
            F.size(F.split(F.col("char_set"), r"\|")).alias("n_preds"),
            "n_subjects", "n_triples")
    )


def void_statistics(triples: DataFrame) -> DataFrame:
    """VoID-style per-predicate dataset statistics (the W3C "Vocabulary
    of Interlinked Datasets" property-partition shape): one row per
    predicate with its triple count, distinct subjects, distinct objects
    and the IRI-object share — the summary a published triple table
    ships alongside (void:propertyPartition / void:triples /
    void:distinctSubjects / void:distinctObjects).

    One aggregation keyed by pred: COUNT plus two COUNT(DISTINCT)
    columns. Spark plans multi-distinct aggregates via expand (3 rows
    per input) combined map-side — the predicate key count is tiny
    (vocabulary-sized), so the reduce side is bounded; no join, no
    window."""
    return (
        triples.groupBy("pred").agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.countDistinct("subj").alias("distinct_subjects"),
            F.countDistinct("obj").alias("distinct_objects"),
            F.round(F.sum(F.when(F.col("obj_is_iri"), 1).otherwise(0))
                    / F.count(F.lit(1)), 6).alias("iri_object_frac"))
    )


def charset_state(triples: DataFrame) -> DataFrame:
    """The mergeable state behind characteristic-set maintenance:
    ``(subj, pred, n)`` with n = the subject's triple count for the
    predicate (objects are distinct in the set-semantic graph, so n
    counts distinct objects). One aggregation; the state is strictly
    narrower than the triple table and is what a production run keeps
    materialized between snapshot versions."""
    return triples.groupBy("subj", "pred").agg(
        F.count(F.lit(1)).alias("n"))


def characteristic_sets_incremental(state: DataFrame, diff: DataFrame
                                    ) -> DataFrame:
    """Maintain :func:`charset_state` under a triple-level diff
    (kg/delta.graph_diff shape: ``(change, subj, pred, obj)`` with
    change ∈ added/removed): returns the new state. Only subjects
    TOUCHED by the diff re-aggregate — their state rows merge with the
    ±1 delta counts and re-enter; the untouched majority passes through
    an anti-join untouched, so the cost is delta-sized plus one
    state-keyed shuffle, never a triple-table rescan (the
    rdfs_incremental argument applied to the statistics catalog).
    Compose with :func:`characteristic_sets_from_state` for the rows
    — that final agg runs over the state (|subj×pred|, already far
    narrower than the graph) and its key domain is the charset
    vocabulary."""
    delta_counts = (
        # unknown change kinds must FAIL, not silently decrement the
        # state (ADVICE r4): raise_error inside the otherwise branch
        # fires only if a row is neither added nor removed
        diff.groupBy("subj", "pred").agg(
            F.sum(F.when(F.col("change") == "added", 1)
                  .when(F.col("change") == "removed", -1)
                  .otherwise(F.raise_error(F.concat(
                      F.lit("characteristic_sets_incremental: unknown "
                            "change kind '"), F.col("change"), F.lit("'"))
                  ).cast("int"))).alias("n"))
    )
    touched = delta_counts.select("subj").distinct()
    updated = (
        state.join(touched, "subj", "left_semi")
        .unionByName(delta_counts)
        .groupBy("subj", "pred").agg(F.sum("n").alias("n"))
        .filter(F.col("n") > 0)
    )
    return state.join(touched, "subj", "left_anti").unionByName(updated)


def characteristic_sets_from_state(state: DataFrame) -> DataFrame:
    """:func:`characteristic_sets` computed from the maintained state
    instead of the triple table — identical output columns."""
    per_subj = state.groupBy("subj").agg(
        F.concat_ws("|", F.sort_array(F.collect_set("pred"))).alias("char_set"),
        F.sum("n").alias("n"))
    return (
        per_subj.groupBy("char_set").agg(
            F.count(F.lit(1)).alias("n_subjects"),
            F.sum("n").alias("n_triples"))
        .select(
            "char_set",
            F.size(F.split(F.col("char_set"), r"\|")).alias("n_preds"),
            "n_subjects", "n_triples")
    )


def star_cardinality(charsets: DataFrame, preds: list[str]) -> DataFrame:
    """Star-pattern cardinality from the characteristic-set table: the
    EXACT number of subjects carrying every predicate in *preds* (and
    their total triple count over all predicates) — Neumann &
    Moerkotte's headline use: because characteristic sets PARTITION the
    subjects, summing ``n_subjects`` over the superset classes is not
    an estimate but the true count, read from a vocabulary-sized stats
    table instead of the 10^12-row graph. One filter over |charsets|
    rows + a 1-row fold; at query-planning time this is a catalog
    lookup, not a data scan (kg/query.predicate_stats' independence
    estimator is the fallback when only per-predicate counts exist)."""
    cond = F.lit(True)
    for p in preds:
        cond = cond & F.array_contains(F.split(F.col("char_set"), r"\|"),
                                       F.lit(p))
    return charsets.filter(cond).agg(
        F.coalesce(F.sum("n_subjects"), F.lit(0)).cast("long")
        .alias("star_subjects"),
        F.coalesce(F.sum("n_triples"), F.lit(0)).cast("long")
        .alias("covered_triples"))
