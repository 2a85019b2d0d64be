"""RDFS forward-chaining materialization over the code knowledge graph.

The reference emits an *asserted* graph only (reader.rb:254-349 — CSVW
csv2rdf defines no entailment step), but a KG-construction pipeline at
web scale almost always materializes the RDFS closure of its ontology so
downstream BGP queries (kg/query.py) need no query-time reasoning. This
module adds that step Spark-first, split by data shape:

- **TBox closure** (rdfs5/rdfs11 — ``subClassOf`` / ``subPropertyOf``
  transitivity): the ontology is vocabulary-sized (tens of rows for the
  code KG, rarely >10^5 anywhere), so the closure iterates a self-join on
  the *small* DataFrame alone — never touching instance data — and the
  result is broadcast.
- **ABox rules** (rdfs2/rdfs3/rdfs7/rdfs9 — domain, range,
  subPropertyOf, subClassOf instance propagation): each is ONE
  broadcast-hash join of the big triple stream against the closed TBox,
  i.e. map-only over the 10^12-row side, no shuffle of instance triples.
  Because the closed TBox is applied in a single pass, no fixpoint loop
  over the big table is needed: rdfs7 with the *transitively closed*
  property hierarchy finds every superproperty in one join, and rdfs9
  over the closed class hierarchy likewise (domain/range types feed
  rdfs9 within the same pass via the closed hierarchy of their classes).

The only instance-level shuffle is the final set-dedup (inferred triples
overlap asserted ones by design), and that runs on the *new* rows only —
the asserted graph is already set-deduplicated by kg/assemble.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import TRIPLE_COLUMNS
from ..csvw.datatypes import RDF_TYPE, RDFS_NS
from .annotate import KG

SUBCLASS = RDFS_NS + "subClassOf"
SUBPROP = RDFS_NS + "subPropertyOf"
DOMAIN = RDFS_NS + "domain"
RANGE = RDFS_NS + "range"

#: The code-KG ontology: (subject, predicate, object) over the classes
#: and properties kg/annotate.py emits. Two-level hierarchies on both
#: sides so the transitive rules (rdfs5/rdfs11) do real work.
CODE_ONTOLOGY: list[tuple[str, str, str]] = [
    # class hierarchy
    (KG + "File", SUBCLASS, KG + "Artifact"),
    (KG + "Module", SUBCLASS, KG + "Artifact"),
    (KG + "Artifact", SUBCLASS, KG + "CodeEntity"),
    (KG + "Class", SUBCLASS, KG + "Symbol"),
    (KG + "Function", SUBCLASS, KG + "Symbol"),
    (KG + "Symbol", SUBCLASS, KG + "CodeEntity"),
    (KG + "Repository", SUBCLASS, KG + "Container"),
    (KG + "Container", SUBCLASS, KG + "CodeEntity"),
    # property hierarchy
    (KG + "imports", SUBPROP, KG + "references"),
    (KG + "dependsOn", SUBPROP, KG + "references"),
    (KG + "references", SUBPROP, KG + "associatedWith"),
    (KG + "defines", SUBPROP, KG + "contains"),
    (KG + "inRepo", SUBPROP, KG + "partOf"),
    # domain / range (classes NOT asserted by annotate.py, so rdfs2/3
    # genuinely add facts rather than re-deriving asserted types)
    (KG + "defines", DOMAIN, KG + "Definer"),
    (KG + "imports", RANGE, KG + "Importable"),
    (KG + "Importable", SUBCLASS, KG + "CodeEntity"),
    (KG + "Definer", SUBCLASS, KG + "CodeEntity"),
]


def ontology_df(spark: SparkSession,
                triples: list[tuple[str, str, str]] | None = None) -> DataFrame:
    """The ontology as a (subj, pred, obj) DataFrame (TBox input shape)."""
    return spark.createDataFrame(
        triples or CODE_ONTOLOGY, "subj string, pred string, obj string")


def tbox_closure(ontology: DataFrame, max_iter: int = 20) -> DataFrame:
    """Transitive closure of ``subClassOf`` and ``subPropertyOf``
    (rdfs11 / rdfs5), plus domain/range rows carried through unchanged.

    Semi-naive iteration on the ontology alone: the frontier is joined
    against the *base* edges each round, so work per round is
    proportional to newly discovered pairs; rounds = hierarchy depth
    (log-doubling is deliberately NOT used — the base stays small and
    semi-naive keeps every join input minimal). The ontology is
    vocabulary-sized; this never sees instance data.
    """
    hier = ontology.filter(F.col("pred").isin(SUBCLASS, SUBPROP)).select(
        "subj", "pred", "obj").distinct()
    closed = hier
    frontier = hier
    for _ in range(max_iter):
        grown = (
            frontier.alias("a")
            .join(F.broadcast(hier.alias("b")),
                  (F.col("a.obj") == F.col("b.subj"))
                  & (F.col("a.pred") == F.col("b.pred")))
            .select(F.col("a.subj").alias("subj"),
                    F.col("a.pred").alias("pred"),
                    F.col("b.obj").alias("obj"))
            .distinct()
            # new pairs only (semi-naive): anti vs everything known
            .join(F.broadcast(closed), ["subj", "pred", "obj"], "left_anti")
        )
        # ontology-sized: a driver count per round is a bounded probe
        if grown.isEmpty():
            break
        closed = closed.unionByName(grown).distinct()
        frontier = grown
    other = ontology.filter(~F.col("pred").isin(SUBCLASS, SUBPROP))
    return closed.unionByName(other.select("subj", "pred", "obj"))


def _as_triples(df: DataFrame) -> DataFrame:
    """IRI-object triple shape — valid ONLY for rows whose objects are
    IRIs by construction (rdf:type triples, TBox rows). Derived EDGES
    carry their asserted row's metadata instead (see rdfs_materialize)."""
    return df.select(
        "subj", "pred", "obj",
        F.lit(True).alias("obj_is_iri"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"),
    )


def _dedup_triples(df: DataFrame) -> DataFrame:
    """Deterministic set-dedup on (subj, pred, obj): when metadata
    variants collide (possible for a derived edge reached through two
    asserted rows that disagree on datatype/lang), the winner is the
    MIN of the metadata struct — stable across runs and engines, unlike
    dropDuplicates' partition-order pick."""
    return (
        df.groupBy("subj", "pred", "obj")
        .agg(F.min(F.struct("obj_is_iri", "obj_datatype", "obj_lang"))
             .alias("_m"))
        .select("subj", "pred", "obj",
                F.col("_m.obj_is_iri").alias("obj_is_iri"),
                F.col("_m.obj_datatype").alias("obj_datatype"),
                F.col("_m.obj_lang").alias("obj_lang"))
    )


def rdfs_materialize(triples: DataFrame, ontology: DataFrame,
                     include_tbox: bool = True) -> DataFrame:
    """Materialize the RDFS closure: asserted graph + inferred triples.

    Every rule is one broadcast join of the instance stream against the
    closed TBox — the 10^12-row side never shuffles; only the (much
    smaller) inferred-new row set pays a set-dedup before the union.

    Rule order within the single pass: rdfs7 (subproperty edges) feeds
    rdfs2/rdfs3 (domain/range types) by unioning the derived edges into
    the edge stream first, and the domain/range output feeds rdfs9 by
    running the class-hierarchy join over asserted+derived types. With a
    transitively closed TBox this one pass is the fixpoint: RDFS has no
    rule that turns an rdfs9-derived type back into a new edge.
    """
    closed = tbox_closure(ontology)
    subprop = F.broadcast(
        closed.filter(F.col("pred") == SUBPROP)
        .select(F.col("subj").alias("p"), F.col("obj").alias("q")))
    subclass = F.broadcast(
        closed.filter(F.col("pred") == SUBCLASS)
        .select(F.col("subj").alias("c"), F.col("obj").alias("d")))
    domains = F.broadcast(
        closed.filter(F.col("pred") == DOMAIN)
        .select(F.col("subj").alias("p"), F.col("obj").alias("c")))
    ranges = F.broadcast(
        closed.filter(F.col("pred") == RANGE)
        .select(F.col("subj").alias("p"), F.col("obj").alias("c")))

    asserted = triples.select(*TRIPLE_COLUMNS)

    # rdfs7: (s p o) & p ⊑ q  →  (s q o)   [one broadcast join]
    derived_edges = (
        asserted.join(subprop, asserted["pred"] == subprop["p"])
        .select("subj", F.col("q").alias("pred"), "obj",
                "obj_is_iri", "obj_datatype", "obj_lang")
    )
    edges_all = asserted.unionByName(derived_edges)

    # rdfs2: (s p o) & p domain C  →  (s type C)
    dom_types = (
        edges_all.join(domains, edges_all["pred"] == domains["p"])
        .select(F.col("subj"), F.col("c").alias("obj"))
    )
    # rdfs3: (s p o) & p range C & o is IRI  →  (o type C)
    rng_types = (
        edges_all.filter(F.col("obj_is_iri"))
        .join(ranges, edges_all["pred"] == ranges["p"])
        .select(F.col("obj").alias("subj"), F.col("c").alias("obj"))
    )
    asserted_types = asserted.filter(F.col("pred") == RDF_TYPE).select(
        "subj", "obj")
    types_all = asserted_types.unionByName(dom_types).unionByName(rng_types)

    # rdfs9: (s type C) & C ⊑ D  →  (s type D)  over asserted+derived types
    super_types = (
        types_all.join(subclass, types_all["obj"] == subclass["c"])
        .select("subj", F.col("d").alias("obj"))
    )
    new_types = (
        dom_types.unionByName(rng_types).unionByName(super_types)
        .select("subj", F.lit(RDF_TYPE).alias("pred"), "obj")
    )

    # Inferred set: type triples are IRI-shaped by construction; derived
    # EDGES keep the asserted row's obj_is_iri/datatype/lang (a literal-
    # valued subproperty must not be relabeled an IRI). Dedup runs on the
    # inferred side only — deterministic min-struct winner.
    inferred = _as_triples(new_types).unionByName(derived_edges)
    if include_tbox:
        inferred = inferred.unionByName(_as_triples(closed))
    inferred = _dedup_triples(inferred)

    # Asserted rows win on (s,p,o) collision, via anti-join — NOT
    # dropDuplicates over the union, which would (a) pick a
    # nondeterministic metadata winner and (b) shuffle the full-width
    # asserted graph. Here the asserted stream flows to the output with
    # no Exchange; the anti-join probes only its narrow (s,p,o)
    # projection (column-pruned at the scan). Requires asserted to be
    # set-deduplicated already — kg/assemble.py guarantees that.
    new_rows = inferred.join(
        asserted.select("subj", "pred", "obj"),
        ["subj", "pred", "obj"], "left_anti")
    return asserted.unionByName(new_rows)


def inferred_only(triples: DataFrame, ontology: DataFrame) -> DataFrame:
    """Just the net-new inferred triples (materialized minus asserted) —
    the delta a production job appends to the triple table."""
    full = rdfs_materialize(triples, ontology, include_tbox=False)
    return full.alias("f").join(
        triples.select("subj", "pred", "obj").alias("t"),
        ["subj", "pred", "obj"], "left_anti")


def rdfs_incremental(materialized: DataFrame, delta: DataFrame,
                     ontology: DataFrame) -> DataFrame:
    """Incremental RDFS maintenance: extend an already-materialized graph
    with a batch of new asserted triples WITHOUT re-running inference
    over the old instance data.

    Correct because RDFS ABox rules are *monotone and single-premise*
    on the instance side (each rule joins ONE instance triple with the
    broadcast TBox — never two instance triples), so inference
    distributes over union:  infer(old ∪ delta) = infer(old) ∪
    infer(delta).  The old graph contributes exactly its existing
    materialization; only the delta pays extraction + inference, and the
    final set-dedup runs on (delta-sized) new rows via anti-join against
    the materialized table — a broadcast anti when the delta is small,
    never a shuffle of the full graph. (Contrast OWL: a transitive
    instance property would break the single-premise shape and force
    semi-naive iteration over old+delta.)
    """
    return materialized.unionByName(
        rdfs_incremental_delta(materialized, delta, ontology))


def rdfs_incremental_delta(materialized: DataFrame, delta: DataFrame,
                           ontology: DataFrame) -> DataFrame:
    """The NET-NEW rows of :func:`rdfs_incremental` alone — what a
    MERGE-INTO-shaped snapshot sink commits as its append (r5: the
    streaming RDFS sink appends exactly this delta per micro-batch
    instead of rewriting the closed graph)."""
    delta_inferred = rdfs_materialize(delta, ontology, include_tbox=False)
    return delta_inferred.join(
        materialized.select("subj", "pred", "obj"),
        ["subj", "pred", "obj"], "left_anti")
