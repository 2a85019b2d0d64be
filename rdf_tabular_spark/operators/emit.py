"""Triple emission: cells -> (subj, pred, obj, obj_is_iri, obj_datatype,
obj_lang) rows (reference reader.rb:258-343).

Per row we assemble an ``array<struct<...>>`` of triples across all columns
with pure column expressions, then ``explode`` — one narrow shuffle-free
projection. Blank nodes are **deterministic skolem ids**
(``_:r<sha256(table_url, sourceRow)>``) so distributed dedup/resume and
re-runs are idempotent (SURVEY.md §7.4-1); fixture comparison canonicalizes
both sides.
"""

from __future__ import annotations

import re
from urllib.parse import unquote, urljoin

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import TRIPLE_COLUMNS
from ..csvw.context import PREFIXES, expand_iri
from ..csvw.datatypes import (
    CSVW_NS,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD,
)
from ..csvw.metadata import CompiledColumn, CompiledTable
from .cells import cell_binding, cell_binding_arr, cell_values
from ..csvw.templates import (
    compile_template,
    is_native_compilable,
    template_variables,
)

TRIPLE_SCHEMA = (
    "subj string, pred string, obj string, obj_is_iri boolean, "
    "obj_datatype string, obj_lang string"
)

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:"
_PNAME_SPLIT = re.compile(r"^([A-Za-z][\w.-]*):(?!//)(.*)$", re.S)


def _base_no_fragment(base: str) -> str:
    return base.split("#", 1)[0]


def _base_dir(base: str) -> str:
    no_frag = _base_no_fragment(base)
    return no_frag.rsplit("/", 1)[0] + "/" if "/" in no_frag else no_frag


def triple(subj: Column, pred: Column, obj: Column, *, is_iri: bool | Column,
           dt: Column | None = None, lang: Column | None = None) -> Column:
    return F.struct(
        subj.cast("string").alias("subj"),
        pred.cast("string").alias("pred"),
        obj.cast("string").alias("obj"),
        (F.lit(is_iri) if isinstance(is_iri, bool) else is_iri).alias("obj_is_iri"),
        (dt if dt is not None else F.lit(None).cast("string")).alias("obj_datatype"),
        (lang if lang is not None else F.lit(None).cast("string")).alias("obj_lang"),
    )


def skolem(*parts: Column | str, prefix: str = "_:b") -> Column:
    """Deterministic blank-node id from its identifying parts."""
    cols = [F.lit(p) if isinstance(p, str) else p.cast("string") for p in parts]
    return F.concat(F.lit(prefix), F.substring(F.sha2(F.concat_ws("\u0000", *cols), 256), 1, 20))


def skolem_str(*parts: object, prefix: str = "_:b") -> str:
    """Driver-side twin of :func:`skolem` (same id scheme)."""
    import hashlib

    joined = "\u0000".join(str(p) for p in parts)
    return prefix + hashlib.sha256(joined.encode("utf-8")).hexdigest()[:20]


def compile_iri_template(
    template: str | None, bindings: dict[str, Column], base: str
) -> Column | None:
    """Compile an about/property/value URL template to a resolved-IRI column:
    RFC 6570 expansion, then pname expansion / document-relative resolution
    against the table url (reference Cell#set_urls metadata.rb:1950-1962)."""
    if template is None:
        return None
    if "{" not in template:
        return F.lit(expand_iri(template, base=base))

    # a compact-IRI template prefix (e.g. "schema:{_name}") expands statically
    static_prefix = template.split("{", 1)[0]
    m = _PNAME_SPLIT.match(static_prefix)
    if m and m.group(1) in PREFIXES:
        template = PREFIXES[m.group(1)] + template[len(m.group(1)) + 1:]
        static_prefix = template.split("{", 1)[0]

    # Document-relative templates with a non-empty static prefix resolve that
    # prefix per RFC 3986 driver-side (dot segments "../x", absolute-path
    # "/x", query "?x=" references — the reference joins the whole expanded
    # value, context.expand_iri documentRelative, metadata.rb:1957); the
    # rewritten template is absolute so the executor-side expression is a
    # plain expansion. Dot segments INSIDE a variable's value are not
    # normalized (they would need per-row resolution; templates putting
    # "../" in data are out of spec scope).
    if (static_prefix
            and not re.match(_SCHEME_RE, static_prefix)
            and not static_prefix.startswith("_:")):
        resolved = urljoin(base, static_prefix)
        # urljoin drops a trailing empty fragment/query marker
        # ("x.csv#" -> ".../x.csv"); the template needs it verbatim
        if static_prefix[-1] in "#?" and not resolved.endswith(static_prefix[-1]):
            resolved += static_prefix[-1]
        template = resolved + template[len(static_prefix):]
        static_prefix = template.split("{", 1)[0]

    if not is_native_compilable(template):
        expanded = _fallback_expand(template, bindings)
    else:
        expanded = compile_template(template, bindings)

    if re.match(_SCHEME_RE, static_prefix):
        return expanded
    if static_prefix.startswith("_:"):
        # blank-node template ("_:{id}"): bnode identifiers are returned
        # as-is, never resolved document-relative (JSON-LD expand_iri)
        return expanded
    if static_prefix.startswith("#"):
        return F.concat(F.lit(_base_no_fragment(base)), expanded)
    if static_prefix == "":
        # resolution shape depends on the expanded value — runtime dispatch
        return (
            F.when(expanded == "", F.lit(base))
            .when(expanded.startswith("_:"), expanded)
            .when(expanded.rlike(_SCHEME_RE), expanded)
            .when(expanded.startswith("#"), F.concat(F.lit(_base_no_fragment(base)), expanded))
            .otherwise(F.concat(F.lit(_base_dir(base)), expanded))
        )
    return F.concat(F.lit(_base_dir(base)), expanded)


def _fallback_expand(template: str, bindings: dict[str, Column]) -> Column:
    """Arrow-batched pandas UDF fallback for RFC 6570 operators the native
    path can't express ({?x}, {/x*}, ...). Vectorized — never per-row Python
    in the sense of a row-at-a-time Python UDF."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from pyspark.sql import SparkSession

    from ..csvw.templates import expand as py_expand
    from ..deploy import ensure_py_files

    active = SparkSession.getActiveSession()
    if active is not None:
        ensure_py_files(active)

    names = [n for n in template_variables(template) if n in bindings]
    if not names:
        return F.lit(py_expand(template, {}))

    from typing import Iterator, Tuple

    # scalar-iterator form: the only pandas-UDF shape that admits a
    # variable number of input columns (a variadic `*cols` signature is
    # rejected by the type-hint inference). Annotations are assigned as
    # REAL typing objects — inline hints would be stringified by
    # `from __future__ import annotations` and the local Iterator/pd
    # names are unresolvable from module globals at inference time.
    def _expand(it):
        for cols in it:
            if not isinstance(cols, tuple):
                cols = (cols,)
            yield pd.Series(
                [py_expand(template, dict(zip(names, row)))
                 for row in zip(*cols)],
                dtype=object)

    _expand.__annotations__ = {
        "it": Iterator[Tuple[pd.Series, ...]],
        "return": Iterator[pd.Series],
    }
    return pandas_udf(_expand, "string")(*[bindings[n] for n in names])


def _common_bindings(table: CompiledTable) -> dict[str, Column]:
    return {
        "_row": F.col("_row").cast("string"),
        "_sourceRow": F.col("_sourceRow").cast("string"),
    }


def _column_bindings(table: CompiledTable, col: CompiledColumn) -> dict[str, Column]:
    b = _common_bindings(table)
    for c in table.columns:
        if c.separator:
            b[c.name] = F.array_join(cell_binding_arr(c), ",")
        else:
            b[c.name] = cell_binding(c)
    b["_name"] = F.lit(unquote(col.name))
    b["_column"] = F.lit(str(col.number))
    b["_sourceColumn"] = F.lit(str(col.source_number))
    return b


def emit_table_triples(
    cells_df: DataFrame, table: CompiledTable, mode: str = "minimal",
    table_node: str | None = None,
) -> DataFrame:
    """Cell structs -> triple rows for one table (T1 minimal / T2 standard)."""
    base = table.url
    default_subject = skolem(table.url, F.col("_sourceRow"), prefix="_:r")

    per_column_arrays: list[Column] = []
    subjects: list[Column] = []

    for col in table.columns:
        values = cell_values(col.name)
        bindings = _column_bindings(table, col)

        about = compile_iri_template(col.about_url, bindings, base)
        subject = F.coalesce(about, default_subject) if about is not None else default_subject
        if col.suppress_output:
            # suppressed cells contribute neither triples nor a
            # csvw:describes subject (reader.rb:308-315 skips before both)
            continue
        subjects.append(subject)

        if col.property_url:
            pred = compile_iri_template(col.property_url, bindings, base)
        else:
            pred = F.lit(_base_no_fragment(base) + "#" + col.name)

        if col.value_url:
            value_url = compile_iri_template(col.value_url, bindings, base)
            emit_cond = F.lit(True) if col.virtual else (F.size(values) > 0)
            arr = F.when(
                emit_cond & value_url.isNotNull(),
                F.array(triple(subject, pred, value_url, is_iri=True)),
            ).otherwise(F.array().cast(f"array<{_triple_struct_ddl()}>"))
        elif col.ordered and col.separator:
            # RDF collection: bnode spine with deterministic ids (T3)
            node_at = lambda i: skolem(  # noqa: E731
                table.url, F.col("_sourceRow"), col.name, i, prefix="_:l")
            head = F.when(
                F.size(values) > 0,
                F.array(triple(subject, pred, node_at(F.lit(0)), is_iri=True)),
            ).otherwise(F.array(triple(subject, pred, F.lit(RDF_NIL), is_iri=True)))
            spine = F.flatten(F.transform(
                values,
                lambda v, i: F.array(
                    triple(node_at(i), F.lit(RDF_FIRST), v["lex"],
                           is_iri=False, dt=v["dt"], lang=v["lang"]),
                    triple(
                        node_at(i), F.lit(RDF_REST),
                        F.when(i == F.size(values) - 1, F.lit(RDF_NIL))
                        .otherwise(node_at(i + 1)),
                        is_iri=True),
                ),
            ))
            arr = F.concat(head, spine)
        else:
            arr = F.transform(
                values,
                lambda v: triple(subject, pred, v["lex"], is_iri=False,
                                 dt=v["dt"], lang=v["lang"]),
            )
        per_column_arrays.append(arr)

    if mode == "standard":
        row_node = skolem(table.url, F.col("_sourceRow"), prefix="_:row")
        tnode = F.lit(table_node if table_node is not None else table.id or None)
        if table_node is None and table.id is None:
            tnode = skolem(table.url, prefix="_:t")
        env = [
            triple(tnode, F.lit(CSVW_NS + "row"), row_node, is_iri=True),
            triple(row_node, F.lit(CSVW_NS + "rownum"), F.col("_row"),
                   is_iri=False, dt=F.lit(XSD + "integer")),
            triple(row_node, F.lit(RDF_TYPE), F.lit(CSVW_NS + "Row"), is_iri=True),
            triple(row_node, F.lit(CSVW_NS + "url"),
                   F.concat(F.lit(_base_no_fragment(base) + "#row="), F.col("_sourceRow")),
                   is_iri=True),
        ]
        per_column_arrays.append(F.array(*env))
        # csvw:describes -> each distinct cell subject
        describes = F.array_distinct(F.array(*subjects)) if subjects else F.array()
        per_column_arrays.append(F.transform(
            describes,
            lambda s: triple(row_node, F.lit(CSVW_NS + "describes"), s, is_iri=True)))
        # csvw:title from rowTitles
        for rt in table.row_titles:
            rcol = next((c for c in table.columns if c.name == rt), None)
            if rcol is None:
                continue
            per_column_arrays.append(F.transform(
                cell_values(rcol.name),
                lambda v: triple(row_node, F.lit(CSVW_NS + "title"), v["lex"],
                                 is_iri=False, dt=v["dt"], lang=v["lang"])))

    if not per_column_arrays:
        return cells_df.sparkSession.createDataFrame([], TRIPLE_SCHEMA)

    all_triples = F.concat(*per_column_arrays) if len(per_column_arrays) > 1 else per_column_arrays[0]
    return (
        cells_df.select(F.explode(all_triples).alias("t"))
        .select(*[F.col(f"t.{c}").alias(c) for c in TRIPLE_COLUMNS])
    )


def _triple_struct_ddl() -> str:
    return ("struct<subj:string,pred:string,obj:string,obj_is_iri:boolean,"
            "obj_datatype:string,obj_lang:string>")
