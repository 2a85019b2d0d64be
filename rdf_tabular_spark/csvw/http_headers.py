"""HTTP response-header dialect overrides (reference reader.rb:113-132).

When the reference's Reader opens tabular data over HTTP, three
Content-Type-driven flags override the dialect before the read —
``text/tsv`` forces a tab separator, a ``header=absent`` parameter turns
the header row off, and the response charset becomes the dialect
encoding — and a single-language ``Content-Language`` becomes the
metadata ``lang`` default (``@metadata.lang ||= lang``; a multi-language
value is ignored, reader.rb:128-131).  Tested by the reference at
reader_spec.rb:53-83.

The sandbox never fetches, so the headers arrive as a caller-supplied
dict (whatever the out-of-band fetch layer observed).  Keys are matched
case-insensitively with ``_``/``-`` treated alike, so both
``{"Content-Type": ...}`` and ``{"content_type": ...}`` shapes work.
With a metadata-first group the reference applies each table's *own*
response headers; this single-dict API models the common direct-input /
single-table case and applies the same overrides to every table.
"""

from __future__ import annotations

from dataclasses import replace

from .metadata import CompiledTable, CompiledTableGroup, Dialect


def _norm_headers(headers: dict | None) -> dict[str, str]:
    return {
        str(k).lower().replace("_", "-"): str(v)
        for k, v in (headers or {}).items()
    }


def parse_content_type(value: str) -> tuple[str, dict[str, str]]:
    """``"text/csv; charset=UTF-8; header=present"`` ->
    ``("text/csv", {"charset": "UTF-8", "header": "present"})``.

    Parameter names lowercase; values keep their case (charset names are
    case-insensitive downstream anyway).  Bare tokens without ``=`` are
    kept as empty-valued params so the reference's exact
    ``split(';').include?('header=absent')`` behavior is reproducible.
    """
    parts = [p.strip() for p in str(value).split(";")]
    mime = parts[0].lower() if parts else ""
    params: dict[str, str] = {}
    for p in parts[1:]:
        if not p:
            continue
        k, _, v = p.partition("=")
        params[k.strip().lower()] = v.strip().strip('"')
    return mime, params


def apply_http_headers(dialect: Dialect, headers: dict | None) -> Dialect:
    """Return a dialect with the reference's three HTTP overrides applied
    (reader.rb:113-116): tsv separator, header=absent, response charset."""
    h = _norm_headers(headers)
    ct = h.get("content-type")
    if ct is None:
        return dialect
    mime, params = parse_content_type(ct)
    updates: dict = {}
    if mime == "text/tsv":
        updates["delimiter"] = "\t"
    if params.get("header") == "absent":
        updates["header"] = False
    if params.get("charset"):
        updates["encoding"] = params["charset"]
    return replace(dialect, **updates) if updates else dialect


def header_language(headers: dict | None) -> str | None:
    """Single-language ``Content-Language`` value, else None — a value
    naming several languages (contains ``,``) is ignored
    (reader.rb:128-129)."""
    lang = _norm_headers(headers).get("content-language")
    if not lang or "," in lang:
        return None
    return lang.strip()


def apply_headers_to_table(table: CompiledTable,
                           headers: dict | None) -> CompiledTable:
    """Dialect overrides + ``lang`` default for one compiled table.

    The reference sets ``metadata.lang ||= lang`` *before* column
    compilation, so columns without their own ``lang`` inherit it; in the
    compiled model that unset state is ``lang == "und"`` (the no-tag
    sentinel, cells.py:230), so exactly those columns take the header
    language."""
    if not headers:
        return table
    updates: dict = {}
    new_dialect = apply_http_headers(table.dialect, headers)
    if new_dialect is not table.dialect:
        updates["dialect"] = new_dialect
    lang = header_language(headers)
    if lang and any(c.lang == "und" for c in table.columns):
        updates["columns"] = tuple(
            replace(c, lang=lang) if c.lang == "und" else c
            for c in table.columns)
    return replace(table, **updates) if updates else table


def apply_headers_to_group(group: CompiledTableGroup,
                           headers: dict | None) -> CompiledTableGroup:
    if not headers:
        return group
    return replace(group, tables=tuple(
        apply_headers_to_table(t, headers) for t in group.tables))
