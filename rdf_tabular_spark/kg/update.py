"""SPARQL 1.1 Update over the triple table (W3C sparql11-update):
INSERT DATA / DELETE DATA / DELETE-INSERT WHERE, graph management
(CLEAR / DROP / ADD / COPY / MOVE over the quad table), plus
transactional application through the snapshot-table seam.

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


# ---------------------------------------------------------------------------
# Graph management (spec §3.2) over the QUAD table (kg/dataset.py layout:
# `graph` column, NULL = default graph). This engine does not track empty
# graphs — a graph exists iff it holds at least one quad — so CLEAR and
# DROP coincide (explicitly allowed by §3.2.2/§3.2.5: "stores that do not
# record empty graphs"), and CREATE is a no-op. All operations are pure
# quad -> quad transforms with SET semantics on (graph, s, p, o).
#
# Scale shape: every selector below is a single predicate on the `graph`
# column — on a graph-partitioned quad table (the dataset module's write
# recommendation) CLEAR/DROP prune to the target partition and the
# 10^12-quad remainder is untouched metadata-only; ADD/COPY/MOVE retag a
# one-graph stream (map-only projection) and merge it with one anti-join
# whose probe side is the single destination graph, never the full table.

def _graph_pred(graph: str | None):
    """Selector for one graph term: None = the default graph. Null-safe
    (``<=>``) so negating it keeps the default graph's NULL rows instead
    of three-valued-logic-dropping them."""
    return F.col("graph").eqNullSafe(F.lit(graph).cast("string"))


def clear_graph(quads: DataFrame, target: str | None = "ALL") -> DataFrame:
    """SPARQL ``CLEAR`` (§3.2.2): remove all quads of the target —
    a graph IRI, ``None`` (DEFAULT), ``"NAMED"`` (every named graph) or
    ``"ALL"``. Equals DROP here (no empty-graph bookkeeping)."""
    if target == "ALL":
        return quads.filter(F.lit(False))
    if target == "NAMED":
        return quads.filter(F.col("graph").isNull())
    return quads.filter(~_graph_pred(target))


def drop_graph(quads: DataFrame, target: str | None = "ALL") -> DataFrame:
    """SPARQL ``DROP`` (§3.2.5) — identical to CLEAR in this store."""
    return clear_graph(quads, target)


def _retag(quads: DataFrame, src: str | None, dst: str | None) -> DataFrame:
    """The quads of *src* retagged into *dst* (pure projection)."""
    return quads.filter(_graph_pred(src)).withColumn(
        "graph", F.lit(dst).cast("string"))


def add_graph(quads: DataFrame, src: str | None,
              dst: str | None) -> DataFrame:
    """SPARQL ``ADD src TO dst`` (§3.2.7): insert all data from the
    source graph into the destination; source unchanged, destination
    rows win (s,p,o) collisions so their metadata columns survive —
    the same merge rule as insert_data."""
    if src == dst:
        return quads  # spec: ADD onto itself is a no-op
    dst_keys = quads.filter(_graph_pred(dst)).select(
        "subj", "pred", "obj")  # graph constant within dst: key on (s,p,o)
    fresh = _retag(quads, src, dst).join(
        dst_keys, ["subj", "pred", "obj"], "left_anti")
    return quads.unionByName(fresh)


def copy_graph(quads: DataFrame, src: str | None,
               dst: str | None) -> DataFrame:
    """SPARQL ``COPY src TO dst`` (§3.2.6): destination data dropped,
    then replaced with the source's; source unchanged."""
    if src == dst:
        return quads
    return quads.filter(~_graph_pred(dst)).unionByName(_retag(quads, src, dst))


def move_graph(quads: DataFrame, src: str | None,
               dst: str | None) -> DataFrame:
    """SPARQL ``MOVE src TO dst`` (§3.2.8): COPY, then DROP the source."""
    if src == dst:
        return quads
    return drop_graph(copy_graph(quads, src, dst), src)


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
