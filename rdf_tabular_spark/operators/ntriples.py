"""S11: N-Triples text serialization of the triple DataFrame.

The reference streams RDF::Statements into any rdf.rb writer
(reader.rb:644-649); here the canonical text sink is N-Triples — one
`format_string` projection, JVM-side escaping, no shuffle, `df.write.text`
friendly at any scale (one line per triple, order-free by graph set
semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _escape_literal(c: Column) -> Column:
    # N-Triples string escaping: backslash first, then quote, then controls
    e = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    e = F.replace(e, F.lit('"'), F.lit('\\"'))
    e = F.replace(e, F.lit("\n"), F.lit("\\n"))
    e = F.replace(e, F.lit("\r"), F.lit("\\r"))
    return F.replace(e, F.lit("\t"), F.lit("\\t"))


def _term(c: Column, is_bnode_ok: bool = True) -> Column:
    return F.when(c.startswith("_:"), c).otherwise(
        F.concat(F.lit("<"), c, F.lit(">")))


def to_ntriples_lines(triples: DataFrame) -> DataFrame:
    """Triple rows -> DataFrame[line: string] in N-Triples syntax."""
    obj_iri = _term(F.col("obj"))
    lit = F.concat(F.lit('"'), _escape_literal(F.col("obj")), F.lit('"'))
    obj_lit = (
        F.when(F.col("obj_lang").isNotNull(),
               F.concat(lit, F.lit("@"), F.col("obj_lang")))
        .when(F.col("obj_datatype").isNotNull(),
              F.concat(lit, F.lit("^^<"), F.col("obj_datatype"), F.lit(">")))
        .otherwise(lit)
    )
    line = F.concat(
        _term(F.col("subj")), F.lit(" "),
        F.concat(F.lit("<"), F.col("pred"), F.lit(">")), F.lit(" "),
        F.when(F.col("obj_is_iri"), obj_iri).otherwise(obj_lit),
        F.lit(" ."),
    )
    return triples.select(line.alias("line"))


def write_ntriples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    to_ntriples_lines(triples).write.mode(mode).text(path)
