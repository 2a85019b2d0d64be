"""Metadata sanitization: warn-and-ignore for invalid property values.

Faithful analog of the reference's typed property setters and validation
matrix (metadata.rb):

- each metadata class declares its properties with a type; a value of the
  wrong shape is WARNED about and the property acts as if unset
  (``set_property``, metadata.rb:1203-1219) — ``:link``/``:uri_template``
  degrade to ``""``, ``:object`` to ``{}``, ``:natural_language`` through
  the ``set_nl`` cleanup (metadata.rb:1221-1236), everything else is
  removed so the default applies;
- structural problems are ERRORS that keep the value in place (processing
  continues in non-validating mode, validation reports them):
  ``@id`` must not be a blank node (metadata.rb:791-795), ``@type`` must
  name the expected class (metadata.rb:802-811), a TableGroup needs a
  non-empty ``tables`` and a Table a ``url`` (REQUIRED,
  metadata.rb:583-584 + 611), a Datatype ``@id`` must not collide with a
  built-in datatype IRI (metadata.rb:797-800), and common-property /
  ``notes`` values must be the restricted JSON-LD dialect
  (``normalize_jsonld``, metadata.rb:1149-1199);
- unexpected keys warn (metadata.rb:578-580).

``sanitize_metadata(doc, base)`` returns ``(clean_doc, warnings, errors)``
— ``clean_doc`` is a deep-copied document with warn-level values removed
or defaulted, so both the compiler (:func:`..metadata.parse_metadata`) and
emission behave exactly as if the invalid property were never written,
while :func:`..metadata.validate_document` surfaces the messages.
"""

from __future__ import annotations

import codecs
import copy
import re
from typing import Any

from .context import _SCHEME_RE, expand_iri
from .datatypes import DATATYPES, UNSUPPORTED

#: column-name syntax (metadata.rb:108)
NAME_SYNTAX = re.compile(
    r"^(?:_col|[a-zA-Z0-9]|%[0-9a-fA-F]{2})(?:[a-zA-Z0-9._]|%[0-9a-fA-F]{2})*$")

#: pragmatic BCP47 shape (reference uses BCP47::Language.identify)
BCP47_SHAPE = re.compile(r"^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$")

_INHERITED_STRING_URLS = ("aboutUrl", "propertyUrl", "valueUrl")

_DIALECT_KEYS = {
    "commentPrefix", "delimiter", "doubleQuote", "encoding", "header",
    "headerRowCount", "lineTerminators", "quoteChar", "skipBlankRows",
    "skipColumns", "skipInitialSpace", "skipRows", "trim",
}

#: expected (non-common, non-@) keys per class (PROPERTIES +
#: INHERITED_PROPERTIES, metadata.rb:29-41, 1294, 1375, 1457, 1560, 1710)
_INHERITED_KEYS = {
    "aboutUrl", "datatype", "default", "lang", "null", "ordered",
    "propertyUrl", "required", "separator", "textDirection", "valueUrl",
}
_EXPECTED = {
    "TableGroup": {"notes", "tables", "tableSchema", "tableDirection",
                   "dialect", "transformations"} | _INHERITED_KEYS,
    "Table": {"dialect", "notes", "suppressOutput", "tableDirection",
              "tableSchema", "transformations", "url"} | _INHERITED_KEYS,
    "Schema": {"columns", "foreignKeys", "primaryKey", "rowTitles"}
    | _INHERITED_KEYS,
    "Column": {"name", "suppressOutput", "titles", "virtual"}
    | _INHERITED_KEYS,
    "Dialect": set(_DIALECT_KEYS),
    "Transformation": {"source", "targetFormat", "scriptFormat", "titles",
                       "url"},
}


def _is_bool(v: Any) -> bool:
    return isinstance(v, bool)


def _is_nonneg_int(v: Any) -> bool:
    return isinstance(v, int) and not isinstance(v, bool) and v >= 0


def _valid_encoding(v: Any) -> bool:
    if not isinstance(v, str):
        return False
    try:
        codecs.lookup(v)
        return True
    except LookupError:
        return False


def _nl_problem(value: Any) -> bool:
    """valid_natural_language_property? (metadata.rb:825-840): True when
    the value is NOT a valid natural-language property."""
    if isinstance(value, str):
        return False
    if isinstance(value, list):
        return not all(isinstance(v, str) for v in value)
    if isinstance(value, dict):
        for k, v in value.items():
            if k != "und" and not BCP47_SHAPE.match(str(k)):
                return True
            if _nl_problem(v):
                return True
        return False
    return True


def _set_nl(value: Any) -> Any:
    """Cleanup an invalid natural-language value (set_nl,
    metadata.rb:1221-1236): keep the salvageable parts."""
    if isinstance(value, str):
        return value
    if isinstance(value, list):
        return [v for v in value if isinstance(v, str)]
    if isinstance(value, dict):
        out = {}
        for k, v in value.items():
            if k != "und" and not BCP47_SHAPE.match(str(k)):
                continue
            vs = v if isinstance(v, list) else [v]
            out[k] = [vv for vv in vs if isinstance(vv, str)]
        return out
    return []


def _warn_drop(obj: dict, cls: str, key: str, ok, expected: str,
               warnings: list[str]) -> None:
    """set_property's invalid branch for :atomic types
    (metadata.rb:1203-1219): warn and remove so the default applies."""
    if key in obj and not ok(obj[key]):
        warnings.append(f"{cls} has invalid property {key!r} "
                        f"({obj[key]!r}): expected {expected}")
        del obj[key]


def _jsonld_problems(value: Any, base: str | None, where: str,
                     errors: list[str]) -> None:
    """Restricted JSON-LD dialect for common properties / notes
    (normalize_jsonld, metadata.rb:1149-1199) — violations are ERRORS."""
    if isinstance(value, list):
        for v in value:
            _jsonld_problems(v, base, where, errors)
        return
    if not isinstance(value, dict):
        return
    if "@value" in value:
        extra = sorted(set(value) - {"@value", "@type", "@language"})
        if extra:
            errors.append(
                f"{where}: value object may not contain keys other than "
                f"@value, @type, or @language: {extra}")
        elif "@language" in value and "@type" in value:
            errors.append(
                f"{where}: value object may not contain both @type and "
                f"@language")
        elif "@language" in value and not (
                isinstance(value["@language"], str)
                and BCP47_SHAPE.match(value["@language"])):
            errors.append(
                f"{where}: value object @language must be a valid "
                f"language tag: {value['@language']!r}")
        elif "@type" in value and not _valid_type_ref(value["@type"]):
            errors.append(
                f"{where}: value object @type must be a defined type: "
                f"{value['@type']!r}")
        return
    for k, v in value.items():
        if k == "@id":
            if not isinstance(v, str):
                errors.append(f"{where}: @id must be a string: {v!r}")
            elif expand_iri(v, base=base).startswith("_:"):
                # explicit bnodes forbidden (metadata.rb:1181)
                errors.append(f"{where}: invalid use of explicit BNode "
                              f"on @id: {v!r}")
        elif k == "@type":
            for vv in (v if isinstance(v, list) else [v]):
                if not _valid_type_ref(vv):
                    errors.append(
                        f"{where}: invalid type {vv!r} in JSON-LD content")
        elif k.startswith("@") or k.startswith("_:"):
            # @list, @set, @context, @language outside @value, @graph ...
            # (metadata.rb:1190-1191)
            errors.append(f"{where}: invalid use of {k!r} in JSON-LD "
                          f"content")
        else:
            _jsonld_problems(v, base, where, errors)


def _valid_type_ref(v: Any) -> bool:
    """@type values must be strings expanding to absolute IRIs, never
    blank nodes (metadata.rb:1172, 1184-1188)."""
    if not isinstance(v, str) or v.startswith("_:"):
        return False
    expanded = expand_iri(v, vocab=True)
    return bool(_SCHEME_RE.match(expanded)) and not expanded.startswith("_:")


def sanitize_metadata(
    doc: dict, base: str | None = None,
) -> tuple[dict, list[str], list[str]]:
    """Return (clean document, warnings, errors) — see module docstring."""
    warnings: list[str] = []
    errors: list[str] = []
    doc = copy.deepcopy(doc)

    # top-level @context: csvw namespace required; invalid @language warns
    # and is ignored (metadata.rb:335-366)
    ctx = doc.get("@context")
    if ctx is not None:
        parts = ctx if isinstance(ctx, list) else [ctx]
        if not any(p == "http://www.w3.org/ns/csvw" for p in parts
                   if isinstance(p, str)):
            warnings.append(
                "context missing required value 'http://www.w3.org/ns/csvw'")
        for p in parts:
            if isinstance(p, dict):
                extra = sorted(set(p) - {"@base", "@language"})
                if extra:
                    # metadata.rb:339 — a hard Error, not a warning
                    errors.append(
                        "@context has object with properties other "
                        f"than @base and @language: {extra}")
                if "@base" in p and not isinstance(p["@base"], str):
                    warnings.append(
                        f"context has invalid @base ({p['@base']!r}): "
                        f"expected string URL")
                    del p["@base"]
            if isinstance(p, dict) and "@language" in p:
                lang = p["@language"]
                if not (isinstance(lang, str) and BCP47_SHAPE.match(lang)):
                    warnings.append(
                        f"context has invalid @language ({lang!r}): "
                        f"expected valid BCP47 language tag")
                    del p["@language"]

    from .metadata import detect_type

    kind = detect_type(doc)
    if kind not in ("TableGroup", "Table") and "tables" not in doc:
        # bare Schema/Column/Dialect/Transformation documents are only ever
        # embedded; sanitized in place by their parent pass
        return doc, warnings, errors
    if kind == "TableGroup" or "tables" in doc:
        _sanitize_obj(doc, "TableGroup", base, warnings, errors)
        tables = doc.get("tables")
        if isinstance(tables, list):
            kept = []
            for t in tables:
                if isinstance(t, dict):
                    _sanitize_obj(t, "Table", base, warnings, errors)
                    kept.append(t)
                else:
                    warnings.append(
                        "TableGroup has invalid property 'tables': "
                        "expected array of Table")
            doc["tables"] = kept
            if not kept:
                errors.append("TableGroup must have tables")
        elif tables is not None:
            warnings.append("TableGroup has invalid property 'tables': "
                            "expected array of Table")
            doc["tables"] = []
            errors.append("TableGroup must have tables")
        else:
            errors.append("TableGroup missing required key 'tables'")
    else:
        _sanitize_obj(doc, "Table", base, warnings, errors)
    return doc, warnings, errors


def _sanitize_obj(obj: dict, cls: str, base: str | None,
                  warnings: list[str], errors: list[str]) -> None:
    _check_meta_keys(obj, cls, base, warnings, errors)
    _check_unexpected(obj, cls, warnings)
    if cls in ("TableGroup", "Table", "Schema", "Column"):
        _sanitize_inherited(obj, cls, warnings, errors)
        for key in ("notes",):
            if key in obj:
                if not isinstance(obj[key], (list, dict)):
                    errors.append(
                        f"{cls} has invalid property 'notes': expected "
                        f"object or array")
                _jsonld_problems(obj[key], base, f"{cls} notes", errors)
        for key, val in obj.items():
            if ":" in key and not key.startswith("@"):
                _jsonld_problems(val, base, f"{cls} {key}", errors)

    if cls == "Table" and not isinstance(obj.get("url"), str):
        if "url" in obj:
            # present but wrong-typed: warn, degrade to "" (set_property
            # :link) — the REQUIRED check sees the key as present
            warnings.append("Table has invalid property 'url': "
                            "expected a string")
            obj["url"] = ""
        else:
            errors.append("Table missing required key 'url'")

    if cls in ("TableGroup", "Table"):
        _warn_drop(obj, cls, "tableDirection",
                   lambda v: v in ("rtl", "ltr", "auto"),
                   "rtl, ltr, or auto", warnings)
        if cls == "Table":
            _warn_drop(obj, cls, "suppressOutput", _is_bool,
                       "boolean true or false", warnings)
        d = obj.get("dialect")
        if d is not None and not isinstance(d, (dict, str)):
            # degrade to {} (defaults apply) rather than deleting: the key
            # participates in type detection, so removal would reclassify
            # the document on a re-parse
            warnings.append(f"{cls} has invalid property 'dialect' "
                            f"({d!r}): expected a URL or object")
            obj["dialect"] = {}
        elif isinstance(d, dict):
            _sanitize_obj(d, "Dialect", base, warnings, errors)
        ts = obj.get("tableSchema")
        if ts is not None and not isinstance(ts, (dict, str)):
            warnings.append(f"{cls} has invalid property 'tableSchema' "
                            f"({ts!r}): expected a URL or object")
            obj["tableSchema"] = {}
        elif isinstance(ts, dict):
            _sanitize_obj(ts, "Schema", base, warnings, errors)
        tr = obj.get("transformations")
        if tr is not None:
            if not isinstance(tr, list):
                warnings.append(f"{cls} has invalid property "
                                f"'transformations': expected array of "
                                f"Transformation")
                obj["transformations"] = []
            else:
                kept = []
                for t in tr:
                    if isinstance(t, dict):
                        _sanitize_obj(t, "Transformation", base,
                                      warnings, errors)
                        kept.append(t)
                    else:
                        warnings.append(
                            f"{cls} has invalid property "
                            f"'transformations': expected array of "
                            f"Transformation")
                obj["transformations"] = kept

    elif cls == "Schema":
        for key in ("primaryKey", "rowTitles"):
            _warn_drop(
                obj, cls, key,
                lambda v: isinstance(v, str)
                or (isinstance(v, list)
                    and all(isinstance(x, str) for x in v)),
                "string or array of strings", warnings)
        cols = obj.get("columns")
        if cols is not None:
            if not isinstance(cols, list):
                warnings.append(f"{cls} has invalid property 'columns': "
                                f"expected array of Column")
                obj["columns"] = []
            else:
                kept = []
                for c in cols:
                    if isinstance(c, dict):
                        _sanitize_obj(c, "Column", base, warnings, errors)
                        kept.append(c)
                    else:
                        warnings.append(
                            f"{cls} has invalid property 'columns': "
                            f"expected array of Column")
                obj["columns"] = kept
        fks = obj.get("foreignKeys")
        if fks is not None:
            if not isinstance(fks, list):
                warnings.append(f"{cls} has invalid property "
                                f"'foreignKeys': expected array of "
                                f"ForeignKey")
                obj["foreignKeys"] = []
            else:
                kept = [fk for fk in fks if isinstance(fk, dict)]
                if len(kept) != len(fks):
                    warnings.append(f"{cls} has invalid property "
                                    f"'foreignKeys': expected array of "
                                    f"ForeignKey")
                    obj["foreignKeys"] = kept

    elif cls == "Column":
        name = obj.get("name")
        if name is not None and not (
                isinstance(name, str) and NAME_SYNTAX.match(name)):
            warnings.append(f"Column name {name!r} has invalid syntax: "
                            f"expected proper name format")
            del obj["name"]
        for key in ("suppressOutput", "virtual"):
            _warn_drop(obj, cls, key, _is_bool,
                       "boolean true or false", warnings)
        titles = obj.get("titles")
        if titles is not None and _nl_problem(titles):
            warnings.append(f"Column has invalid property 'titles' "
                            f"({titles!r}): expected a valid natural "
                            f"language property")
            obj["titles"] = _set_nl(titles)

    elif cls == "Dialect":
        _sanitize_dialect(obj, warnings)

    elif cls == "Transformation":
        for key in ("url", "targetFormat", "scriptFormat"):
            v = obj.get(key)
            if v is None:
                errors.append(
                    f"Transformation missing required key '{key}'")
            elif not isinstance(v, str):
                warnings.append(f"Transformation has invalid property "
                                f"{key!r} ({v!r}): expected a string")
                # DELETE rather than blank: an empty-string stand-in
                # would satisfy the next sanitize pass and break
                # idempotence (the error must persist — found by the
                # Hypothesis property, r4 tail)
                del obj[key]
                errors.append(
                    f"Transformation missing required key '{key}'")
        _warn_drop(obj, cls, "source", lambda v: v in ("json", "rdf"),
                   "json or rdf", warnings)
        if "titles" in obj and _nl_problem(obj["titles"]):
            warnings.append("Transformation has invalid property 'titles'")
            obj["titles"] = _set_nl(obj["titles"])


def _check_meta_keys(obj: dict, cls: str, base: str | None,
                     warnings: list[str], errors: list[str]) -> None:
    """@id / @type checks shared by every class (metadata.rb:388-394,
    791-811)."""
    if "@id" in obj:
        v = obj["@id"]
        if not isinstance(v, str):
            warnings.append(f"{cls} has invalid property '@id' ({v!r}): "
                            f"expected a string")
            obj["@id"] = ""
        elif v.startswith("_:"):
            errors.append(f"{cls} has invalid property '@id' ({v!r}): "
                          f"must not start with '_:'")
    if "@type" in obj:
        v = obj["@type"]
        expected = "Template" if cls == "Transformation" else cls
        if isinstance(v, str) and v.startswith("_:"):
            errors.append(f"{cls} has invalid property '@type' ({v!r}): "
                          f"must not start with '_:'")
        elif v != expected:
            errors.append(f"{cls} has invalid property '@type' ({v!r}): "
                          f"expected {expected}")


def _check_unexpected(obj: dict, cls: str, warnings: list[str]) -> None:
    """Unknown keys warn (metadata.rb:578-580). Common-property keys
    (containing ':') are allowed everywhere EXCEPT on Dialect."""
    expected = _EXPECTED[cls]
    unexpected = []
    for k in obj:
        if k in ("@id", "@type", "@context"):
            continue
        if ":" in k and cls != "Dialect":
            continue
        if k not in expected:
            unexpected.append(k)
    if unexpected:
        warnings.append(f"{cls} has unexpected keys: {unexpected}")


def _sanitize_inherited(obj: dict, cls: str, warnings: list[str],
                        errors: list[str]) -> None:
    """Inherited-property value checks (metadata.rb:424-447)."""
    for key in _INHERITED_STRING_URLS:
        v = obj.get(key)
        if v is not None and not isinstance(v, str):
            warnings.append(f"{cls} has invalid property {key!r} "
                            f"({v!r}): expected string")
            obj[key] = ""  # uri_template degrades to "" (set_property)
    _warn_drop(obj, cls, "default", lambda v: isinstance(v, str),
               "string", warnings)
    _warn_drop(obj, cls, "lang",
               lambda v: isinstance(v, str) and BCP47_SHAPE.match(v),
               "valid BCP47 language tag", warnings)
    _warn_drop(
        obj, cls, "null",
        lambda v: isinstance(v, str)
        or (isinstance(v, list) and all(isinstance(x, str) for x in v)),
        "string or array of strings", warnings)
    for key in ("ordered", "required"):
        _warn_drop(obj, cls, key, _is_bool, "boolean", warnings)
    _warn_drop(obj, cls, "separator",
               lambda v: v is None or isinstance(v, str),
               "string or null", warnings)
    _warn_drop(obj, cls, "textDirection", lambda v: v in ("rtl", "ltr"),
               "rtl or ltr", warnings)
    dt = obj.get("datatype")
    if dt is not None and not isinstance(dt, dict):
        if not (isinstance(dt, str)
                and (dt in DATATYPES or dt in UNSUPPORTED)):
            warnings.append(f"{cls} has invalid property 'datatype' "
                            f"({dt!r}): expected a built-in or an object")
            del obj["datatype"]
    elif isinstance(dt, dict):
        did = dt.get("@id")
        if isinstance(did, str):
            if did.startswith("_:"):
                errors.append(f"{cls} datatype has invalid property '@id' "
                              f"({did!r}): must not start with '_:'")
            elif did in DATATYPES.values():
                errors.append(f"{cls} datatype has invalid property '@id' "
                              f"({did!r}): must not be the URL of a "
                              f"built-in datatype")
        elif did is not None:
            warnings.append(f"{cls} datatype has invalid property '@id' "
                            f"({did!r}): expected a string")
            dt["@id"] = ""


def _sanitize_dialect(obj: dict, warnings: list[str]) -> None:
    """Dialect property checks (metadata.rb:1737-1753); invalid values
    warn and the default applies. ``quoteChar`` and ``commentPrefix``
    additionally accept JSON null (quoting / comments disabled), which the
    engine supports."""
    checks = {
        "commentPrefix": (lambda v: v is None or isinstance(v, str),
                          "a string"),
        "delimiter": (lambda v: isinstance(v, str), "a string"),
        "quoteChar": (lambda v: v is None or isinstance(v, str),
                      "a string"),
        "lineTerminators": (
            lambda v: isinstance(v, str)
            or (isinstance(v, list) and all(isinstance(x, str) for x in v)),
            "a string or array of strings"),
        "doubleQuote": (_is_bool, "boolean true or false"),
        "header": (_is_bool, "boolean true or false"),
        "skipInitialSpace": (_is_bool, "boolean true or false"),
        "skipBlankRows": (_is_bool, "boolean true or false"),
        "encoding": (_valid_encoding, "a valid encoding"),
        "headerRowCount": (_is_nonneg_int, "a non-negative integer"),
        "skipColumns": (_is_nonneg_int, "a non-negative integer"),
        "skipRows": (_is_nonneg_int, "a non-negative integer"),
        "trim": (lambda v: isinstance(v, bool)
                 or str(v).lower() in ("true", "false", "start", "end"),
                 "true, false, start or end"),
    }
    for key, (ok, expected) in checks.items():
        v = obj.get(key)
        if key in obj and not ok(v):
            warnings.append(f"Dialect has invalid property {key!r} "
                            f"({v!r}): expected {expected}")
            del obj[key]
