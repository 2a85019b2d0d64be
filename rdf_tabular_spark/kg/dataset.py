"""SPARQL dataset semantics over a QUAD table: named graphs + default
graph (SPARQL 1.1 §13, RDF datasets).

The reference emits one RDF graph per run (rdf-tabular's to_rdf produces
a single repository, reader.rb); a production KG over 10^6 repositories
wants the dataset model instead — one NAMED graph per repository plus a
shared default graph of cross-repo facts — so provenance, per-repo
retraction, and GRAPH-scoped queries come for free. This module adds
that layer over the same triple schema:

- ``with_graph(triples, graph_expr)``: attach a ``graph`` column from a
  SQL expression over the triple columns; ``NULL`` graph = the default
  graph (mirrors the SPARQL dataset: GRAPH ranges over NAMED graphs
  only, never the default graph).
- ``match_quads(quads, patterns)``: BGP matching where each pattern is a
  4-tuple ``(g, s, p, o)`` —

  * ``g is None``      -> pattern matches the DEFAULT graph only,
  * ``g`` a constant   -> ``GRAPH <iri> { s p o }``,
  * ``g`` a variable   -> ``GRAPH ?g { s p o }``: ranges over named
    graphs, binding the graph IRI; the same ``?g`` on several patterns
    keeps them inside ONE graph, exactly SPARQL's GRAPH-group scoping.

Scale design: the graph term is just one more constant filter / join
column — a constant ``g`` sits on the scan next to the pred filter (a
quad table partitioned by ``graph`` prunes to one repo's partition), a
variable ``g`` rides the same equi-join the triple variables use. The
quad matcher reuses the triple compiler (kg/query._compile_pattern) for
everything below the graph term, so property paths, negated sets,
alternation and sequences all work inside a CONSTANT or DEFAULT graph
scope. Inside ``GRAPH ?var`` only plain/variable predicates are
supported: a property path there must stay within each graph, i.e. a
per-graph closure, which would hide an unbounded iterative join behind
pattern syntax — callers iterate named graphs explicitly instead
(``named_graphs`` is a tiny driver-side list by design: one per repo
partition, not per row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_tabular_spark.kg.query import (
    DEFAULT_PATH_MAX_HOPS,
    _compile_pattern,
    _is_var,
    _match_patterns,
)

_QPOSITIONS = ("graph", "subj", "pred", "obj")


def with_graph(triples: DataFrame, graph_expr: str) -> DataFrame:
    """Attach a ``graph`` column computed by *graph_expr* (SQL over the
    triple columns). NULL = default graph. A pure projection — no
    shuffle; write the result partitioned by ``graph`` for per-repo
    pruning."""
    return triples.withColumn("graph", F.expr(graph_expr))


def default_graph(quads: DataFrame) -> DataFrame:
    """The default graph as a plain triple table."""
    return quads.filter(F.col("graph").isNull()).drop("graph")


def union_graph(quads: DataFrame) -> DataFrame:
    """The RDF merge of every graph (named + default) as a triple table
    — set semantics, so the dedup runs on the narrow (s, p, o) key."""
    return quads.drop("graph").dropDuplicates(["subj", "pred", "obj"])


def named_graphs(quads: DataFrame) -> DataFrame:
    """The named-graph IRIs (one row per graph)."""
    return quads.filter(F.col("graph").isNotNull()) \
        .select("graph").distinct()


def _is_path_pred(pred) -> bool:
    if isinstance(pred, tuple):
        return True
    if not isinstance(pred, str) or _is_var(pred):
        return False
    return (pred.startswith(("!", "^")) or "|" in pred
            or pred.endswith(("+", "*", "?")))


def _compile_quad_pattern(quads: DataFrame, qpat: tuple,
                          path_max_hops: int) -> DataFrame:
    if len(qpat) != 4:
        raise ValueError(f"quad pattern must be (g, s, p, o): {qpat!r}")
    g = qpat[0]
    if g is None:
        return _compile_pattern(
            quads.filter(F.col("graph").isNull()), qpat[1:], path_max_hops)
    if not _is_var(g):
        return _compile_pattern(
            quads.filter(F.col("graph") == g), qpat[1:], path_max_hops)
    # GRAPH ?var: named graphs only; the graph term joins like any other
    # variable. Property paths would need a per-graph closure — rejected
    # with a pointer at the explicit alternative.
    if _is_path_pred(qpat[2]):
        raise ValueError(
            f"property path {qpat[2]!r} inside GRAPH {g} is not supported: "
            "a path must stay within each named graph (per-graph closure); "
            "iterate named_graphs() and use a constant graph term instead")
    df = quads.filter(F.col("graph").isNotNull())
    var_cols: dict[str, str] = {}
    for pos, term in zip(_QPOSITIONS, qpat):
        if _is_var(term):
            name = term[1:]
            if not name:
                raise ValueError(f"empty variable name in {qpat!r}")
            if name in var_cols:  # repeated var inside one pattern
                df = df.filter(F.col(var_cols[name]) == F.col(pos))
            else:
                var_cols[name] = pos
        else:
            df = df.filter(F.col(pos) == term)
    return df.select(
        *[F.col(pos).alias(name) for name, pos in var_cols.items()])


def match_quads(quads: DataFrame, patterns: list[tuple],
                project: list[str] | None = None,
                optional: list[tuple] | None = None,
                bind: dict[str, str] | None = None,
                filters: list[str] | None = None,
                distinct: bool = True,
                allow_cartesian: bool = False,
                path_max_hops: int = DEFAULT_PATH_MAX_HOPS) -> DataFrame:
    """Match a conjunction of quad patterns (see module docstring for
    the graph-term forms); columns = variable names. *optional*, *bind*,
    *filters*, *project* and *distinct* behave exactly like
    kg/query.match_bgp — OPTIONAL left-joins on shared variables, BIND
    projects new columns before FILTER, set semantics by default (the
    accumulation core is literally shared: kg/query._match_patterns)."""
    return _match_patterns(
        lambda qpat: _compile_quad_pattern(quads, qpat, path_max_hops),
        patterns, project=project, optional=optional, bind=bind,
        filters=filters, distinct=distinct, allow_cartesian=allow_cartesian)
