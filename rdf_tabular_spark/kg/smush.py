"""owl:sameAs smushing — entity canonicalization over the triple table.

The reference's CSVW mapping mints one IRI per row/cell (metadata.rb
aboutUrl/valueUrl) and leaves identity resolution to the RDF consumer;
a KG-construction pipeline has to close the loop: discover equivalent
entity IRIs, pick a stable canonical per equivalence class, and rewrite
the graph so every triple speaks about the canonical (the "canonicalizes
repo/path/symbol entities into stable IRIs" stage).

Scale shape: the sameAs pair graph is tiny relative to the triple table
(bounded by 2x the link count), so the closure runs min-label
propagation on pairs only (kg/link.connected_components — the same
engine the dedup-cluster op uses) and the mapping broadcasts; the two
rewrite joins are then map-side, the untouched stream never shuffles,
and the post-rewrite set-dedup runs on the REWRITTEN rows only.
A rewritten row can never collide with an untouched one: rewriting
leaves a mapped IRI (the canonical) in subject or object position and
mapped IRIs by definition never appear in untouched rows — so deduping
the rewritten subset alone preserves global set semantics, the same
argument rdfs_materialize uses for its inferred-side-only dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import TRIPLE_COLUMNS
from . import link

OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def sameas_pairs(triples: DataFrame) -> DataFrame:
    """owl:sameAs links asserted in the graph -> (a, b) pair table."""
    return (triples
            .filter((F.col("pred") == OWL_SAMEAS) & F.col("obj_is_iri")
                    & (F.col("subj") != F.col("obj")))
            .select(F.col("subj").alias("a"), F.col("obj").alias("b"))
            .dropDuplicates(["a", "b"]))


def sameas_from_shared_key(triples: DataFrame, pred: str) -> DataFrame:
    """Key-collision entity linking: subjects sharing the same LITERAL
    value of *pred* (e.g. kg:name) are equivalent; emit star-shaped
    (alias, class-min) pairs. One hash agg on the literal (map-side
    partial combine bounds hot names) + one fan-out join — pair volume
    is O(occurrences), never O(occurrences²)."""
    vals = (triples
            .filter((F.col("pred") == pred) & ~F.col("obj_is_iri"))
            .select("subj", "obj"))
    canon = vals.groupBy("obj").agg(F.min("subj").alias("canonical"))
    return (vals.join(canon, "obj")
            .filter(F.col("subj") != F.col("canonical"))
            .select(F.col("subj").alias("a"),
                    F.col("canonical").alias("b")))


def sameas_closure(pairs: DataFrame, max_iter: int = 10) -> DataFrame:
    """Symmetric-transitive closure of the pair graph -> (iri, canonical)
    with canonical = lexicographic min IRI of the equivalence class.
    Includes the identity row for each class canonical — smush() relies
    on every mapped node (alias OR canonical) being present."""
    nodes = (pairs.select(F.col("a").alias("mention"))
             .unionByName(pairs.select(F.col("b").alias("mention")))
             .distinct())
    return (link.connected_components(nodes, pairs, max_iter)
            .select(F.col("mention").alias("iri"), "canonical"))


def smush(triples: DataFrame, *, mapping: DataFrame | None = None,
          pairs: DataFrame | None = None, max_iter: int = 10,
          drop_sameas: bool = True,
          broadcast_mapping: bool = True) -> DataFrame:
    """Rewrite every subject / IRI object to its class canonical.

    *mapping* is (iri, canonical) — computed from *pairs* (or from
    asserted owl:sameAs links) when not given; it MUST contain the
    identity row for each canonical (sameas_closure guarantees this).
    RDF term identity keys the final set: two triples with the same
    object string but different datatype/lang stay distinct rows.
    Set *broadcast_mapping* False when the equivalence classes are too
    large to broadcast — the rewrite joins then shuffle on the IRI."""
    if mapping is None:
        p = pairs if pairs is not None else sameas_pairs(triples)
        mapping = sameas_closure(p, max_iter)
    base = (triples.filter(F.col("pred") != OWL_SAMEAS)
            if drop_sameas else triples)
    m = F.broadcast(mapping) if broadcast_mapping else mapping
    ms = m.select(F.col("iri").alias("_si"), F.col("canonical").alias("_sc"))
    mo = m.select(F.col("iri").alias("_oi"), F.col("canonical").alias("_oc"))
    j = (base
         .join(ms, F.col("subj") == F.col("_si"), "left")
         .join(mo, (F.col("obj") == F.col("_oi")) & F.col("obj_is_iri"),
               "left"))
    touched = F.col("_sc").isNotNull() | F.col("_oc").isNotNull()
    rewritten = (j.filter(touched)
                 .select(F.coalesce("_sc", "subj").alias("subj"), "pred",
                         F.coalesce("_oc", "obj").alias("obj"),
                         "obj_is_iri", "obj_datatype", "obj_lang")
                 .dropDuplicates(TRIPLE_COLUMNS))
    untouched = j.filter(~touched).select(*TRIPLE_COLUMNS)
    return untouched.unionByName(rewritten)
