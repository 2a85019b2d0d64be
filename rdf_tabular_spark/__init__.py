"""rdf_tabular_spark — a PySpark-native CSVW tabular-to-RDF / knowledge-graph
construction engine.

A from-scratch re-expression of the semantics of the W3C CSVW specs
(Tabular Data Model, Metadata Vocabulary, csv2rdf, csv2json) as implemented
by the reference Ruby gem ``rdf-tabular`` (see /root/reference), built on
the Spark DataFrame API:

- driver-side: metadata discovery/normalization/inheritance compiled into a
  frozen :class:`~rdf_tabular_spark.csvw.metadata.CompiledTable` plan
- executor-side: the whole cell pipeline (whitespace normalization, typing,
  UAX-35 number/date parsing, facet validation, URI-template expansion,
  triple emission) runs as native Spark column expressions inside
  whole-stage codegen — no per-row Python
- scale-path: a source-code knowledge-graph construction pipeline
  (extraction via vectorized Arrow UDFs, minhash-LSH entity linking,
  salted dedup) under :mod:`rdf_tabular_spark.kg`.
"""

__version__ = "0.1.0"

TRIPLE_COLUMNS = ["subj", "pred", "obj", "obj_is_iri", "obj_datatype", "obj_lang"]

_ENTRY_POINTS = ("to_triples", "to_json", "to_json_lines", "validate")


def __getattr__(name):
    """Lazy re-export of the reader entry points (keeps ``import
    rdf_tabular_spark`` free of a pyspark import until first use)."""
    if name in _ENTRY_POINTS:
        from . import reader

        return getattr(reader, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
