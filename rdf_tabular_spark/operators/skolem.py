"""RDF 1.1 skolemization (§3.5 "Replacing blank nodes with IRIs").

The emitters mint DETERMINISTIC blank-node labels (operators/emit.py
skolem_str — reference reader.rb mints RDF::Node per row); systems that
join, diff, or re-ingest graphs across runs want real IRIs instead:
skolemize rewrites every ``_:label`` to the spec's well-known form
``{base}/.well-known/genid/{label}``, deskolemize inverts it. Both are
single regexp projections — map-only, whole-stage codegen, no shuffle
at any scale. Labels minted by this engine are IRI-safe by
construction ([A-Za-z0-9._-] hex-ish); foreign labels outside that
alphabet would need percent-encoding, which the caller owns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GENID = "/.well-known/genid/"


def _prefix(base: str) -> str:
    return base.rstrip("/") + GENID


def skolemize(triples: DataFrame, base: str) -> DataFrame:
    """``_:label`` -> ``{base}/.well-known/genid/{label}`` in subject
    and (IRI-)object position; literals and real IRIs pass through."""
    p = _prefix(base)

    def sk(c: Column) -> Column:
        return F.regexp_replace(c, "^_:", p)

    return triples.withColumn("subj", sk(F.col("subj"))).withColumn(
        "obj",
        F.when(F.col("obj_is_iri"), sk(F.col("obj")))
        .otherwise(F.col("obj")))


def deskolemize(triples: DataFrame, base: str) -> DataFrame:
    """Inverse of :func:`skolemize` for the same *base*."""
    import re

    p = "^" + re.escape(_prefix(base))

    def unsk(c: Column) -> Column:
        return F.regexp_replace(c, p, "_:")

    return triples.withColumn("subj", unsk(F.col("subj"))).withColumn(
        "obj",
        F.when(F.col("obj_is_iri"), unsk(F.col("obj")))
        .otherwise(F.col("obj")))
