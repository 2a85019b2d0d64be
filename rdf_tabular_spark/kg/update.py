"""SPARQL 1.1 Update over the triple table (W3C sparql11-update):
INSERT DATA / DELETE DATA / DELETE-INSERT WHERE, plus transactional
application through the snapshot-table seam.

The reference emits a graph and stops (rdf-tabular writes RDF,
reader.rb); a living KG needs mutation with SPARQL's semantics. All
operations here are PURE — they take the current graph DataFrame and
return the updated graph — so the caller decides materialization;
``transactional_update`` composes them with SnapshotTable's conditional
commit for an atomic read-modify-write with time travel (every update
is a snapshot; SPARQL's GRAPH STORE protocol on top of Iceberg-style
storage).

Semantics (spec §3.1.3): a DELETE/INSERT WHERE evaluates the WHERE
pattern ONCE against the PRE-state, instantiates both template sets
from those solutions, then applies deletes and inserts — so a
predicate rename ``DELETE { ?s :p ?o } INSERT { ?s :q ?o } WHERE
{ ?s :p ?o }`` is exact even when :q triples already exist.

Scale shape: the WHERE solutions and both instantiated template sets
are delta-sized; the delete is a LEFT ANTI join of the graph against
the (small) delete set — AQE broadcasts it, so the 10^12-triple graph
streams through a map-side anti-join and never shuffles — and the
insert is an anti-join of the (small) insert set against the graph
(one semi-join probe of the graph, again broadcast-side delta) followed
by a union. Existing rows WIN on (s,p,o) collision, preserving their
datatype/lang metadata — the same asserted-wins rule as
kg/infer.rdfs_materialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_tabular_spark.kg.query import (
    DEFAULT_PATH_MAX_HOPS,
    construct,
)

_KEY = ["subj", "pred", "obj"]


def _merge_new(graph: DataFrame, new: DataFrame) -> DataFrame:
    """Set-union *new* into *graph* on the (s, p, o) key; existing rows
    win, so asserted metadata is never clobbered by an insert of the
    same triple."""
    fresh = new.join(graph.select(*_KEY), _KEY, "left_anti")
    return graph.unionByName(fresh)


def insert_data(graph: DataFrame, new: DataFrame) -> DataFrame:
    """SPARQL INSERT DATA: add ground triples (set semantics)."""
    return _merge_new(graph, new.dropDuplicates(_KEY))


def delete_data(graph: DataFrame, gone: DataFrame) -> DataFrame:
    """SPARQL DELETE DATA: remove ground triples by (s, p, o); deleting
    an absent triple is a no-op per spec."""
    return graph.join(gone.select(*_KEY), _KEY, "left_anti")


def delete_insert(graph: DataFrame, where: list[tuple],
                  delete_templates: list[tuple] | None = None,
                  insert_templates: list[tuple] | None = None,
                  filters: list[str] | None = None,
                  path_max_hops: int = DEFAULT_PATH_MAX_HOPS) -> DataFrame:
    """SPARQL DELETE/INSERT WHERE (spec §3.1.3). Templates use the
    CONSTRUCT form ``(s, p, o[, obj_is_iri])``; both sets instantiate
    from the WHERE solutions against the PRE-state, then deletes apply
    before inserts. At least one template set is required."""
    if not delete_templates and not insert_templates:
        raise ValueError("DELETE/INSERT WHERE needs at least one template")
    dels = construct(graph, where, delete_templates, filters=filters,
                     path_max_hops=path_max_hops) \
        if delete_templates else None
    ins = construct(graph, where, insert_templates, filters=filters,
                    path_max_hops=path_max_hops) \
        if insert_templates else None
    out = graph
    if dels is not None:
        out = delete_data(out, dels)
    if ins is not None:
        out = _merge_new(out, ins)
    return out


def transactional_update(table, spark, update_fn) -> int:
    """Atomic read-modify-write of a graph stored in a SnapshotTable:
    read the current snapshot, apply *update_fn* (graph -> graph, e.g. a
    ``delete_insert`` closure), publish as an overwrite CONDITIONAL on
    the read snapshot still being current — a concurrent update makes
    the commit abort instead of silently dropping its rows (the caller
    re-reads and retries, classic optimistic concurrency). Returns the
    new snapshot id; every update is time-travelable."""
    sid = table.current_snapshot_id()
    if sid is None:
        raise ValueError(f"snapshot table {table.path} has no snapshots")
    out = update_fn(table.read(spark, sid))
    return table.commit(out, mode="overwrite", require_parent=sid)
