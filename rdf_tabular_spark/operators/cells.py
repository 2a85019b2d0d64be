"""The CSVW cell pipeline as Spark column expressions.

Per column: whitespace normalization -> dialect trim -> default-on-empty ->
separator split -> per-item trim/default/null -> datatype parse+validate
(UAX-35 numbers/dates, boolean formats, regex formats, facets) -> typed
values + error channel (reference Row#initialize metadata.rb:2029-2119 and
value_matching_datatype metadata.rb:2149-2293).

Everything here stays inside whole-stage codegen: `when`/`otherwise`
chains, `rlike` against driver-compiled regexes, `regexp_extract`,
higher-order array functions. No Python UDFs.

The output per column is a struct column ``cell_<name>``:

    struct<
      values:  array<struct<lex:string, dt:string, lang:string, err:string>>,
      errors:  array<string>,
      binding: string,            -- template variable value (first lex)
      binding_arr: array<string>  -- for separator columns
    >
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..csvw import uax35
from ..csvw.datatypes import (
    BINARY_BASES,
    DATE_BASES,
    DURATION_BASES,
    FLOATING_BASES,
    INTEGER_BASES,
    INTEGER_BOUNDS,
    NO_ITEM_STRIP,
    NO_WS_COLLAPSE,
    NO_WS_REPLACE,
    NUMERIC_BASES,
    UNSUPPORTED,
    XSD,
    lexical_regex_for,
)
from ..csvw.metadata import CompiledColumn, CompiledDatatype, CompiledTable
# _let re-homed to expr.py (urls.py needs it too); old name kept for
# this module's call sites
from ..expr import let_ as _let

ITEM_SCHEMA = "struct<lex:string,dt:string,lang:string,err:string>"


def _java_re(py_regex: str) -> str:
    """Our compilers emit Java-compatible regexes already; hook kept for
    any future dialect fixups."""
    return py_regex


# --------------------------------------------------------------------------
# numeric normalization (C6/C7)
# --------------------------------------------------------------------------

def _shift_decimal_expr(c: Column, sym: str, k: int) -> Column:
    """Percent / per-mille decimal shift on a cleaned numeric string
    (uax35.rb:203-252), as pure expressions.

    Kept deliberately compact (expression-tree size matters: these trees are
    replicated per column per item): left-pad the integer part to >= k+1
    digits, then the split point is uniform for the short and long cases."""
    c2 = F.replace(c, F.lit(sym), F.lit(""))
    sign = F.regexp_extract(c2, r"^([+-])", 1)
    body = F.regexp_replace(c2, r"^[+-]", "")
    lhs = F.substring_index(body, ".", 1)
    rhs = body.substr(F.length(lhs) + 2, F.length(body))  # '' when no '.'
    lp = F.lpad(lhs, F.greatest(F.length(lhs), F.lit(k + 1)).cast("int"), "0")
    head_len = F.length(lp) - F.lit(k)
    shifted = F.concat(
        lp.substr(F.lit(1), head_len), F.lit("."),
        lp.substr(head_len + 1, F.lit(k)), rhs,
    )
    return F.concat(sign, F.replace(shifted, F.lit("E"), F.lit("e")))


def normalize_number_expr(v: Column, plan: uax35.NumberPlan) -> Column:
    """Match + normalize a numeric lexical value. Returns the normalized
    lexical string, or NULL when the value does not match the pattern."""
    upper = F.upper(v)
    ok = upper.rlike(_java_re(plan.regex))
    if len(plan.group_char) == 1:
        ok = ok & ~v.contains(plan.group_char * 2)
    cleaned = F.regexp_replace(upper, r"\s+", "")
    # strip literal display affixes (NumberPlan docstring): anchored by
    # the regex match, so prefix/suffix removal is exact
    if plan.prefix:
        p = plan.prefix.upper()
        cleaned = F.when(
            cleaned.startswith(p), F.substring(cleaned, len(p) + 1, 2**30)
        ).otherwise(cleaned)
    if plan.suffix:
        s = plan.suffix.upper()
        cleaned = F.when(
            cleaned.endswith(s),
            F.substring(cleaned, 1, F.length(cleaned) - len(s)),
        ).otherwise(cleaned)
    cleaned = F.replace(cleaned, F.lit(plan.group_char), F.lit(""))
    if plan.decimal_char != ".":
        cleaned = F.replace(cleaned, F.lit(plan.decimal_char), F.lit("."))
    result = (
        F.when(cleaned.contains("%"), _shift_decimal_expr(cleaned, "%", 2))
        .when(cleaned.contains("‰"), _shift_decimal_expr(cleaned, "‰", 3))
        .when(cleaned.contains("NAN"), F.replace(cleaned, F.lit("NAN"), F.lit("NaN")))
        .otherwise(F.replace(cleaned, F.lit("E"), F.lit("e")))
    )
    return F.when(ok, result)


# --------------------------------------------------------------------------
# date normalization (C8)
# --------------------------------------------------------------------------

def normalize_date_expr(v: Column, plan: uax35.DatePlan, base: str) -> Column:
    """Match + canonicalize a date/time lexical value per the compiled
    pattern; NULL when it does not match."""
    regex = _java_re(plan.regex)
    ok = v.rlike(regex)

    def grp(name: str) -> Column | None:
        idx = plan.groups.get(name)
        return F.regexp_extract(v, regex, idx) if idx else None

    parts: list[Column] = []
    yr = grp("yr")
    if yr is not None:
        yri = yr.cast("int")
        windowed = (
            F.when(F.length(yr) >= 4, yri)
            .when((yri <= 69) | ((yri >= 100) & (yri <= 999)), yri + 2000)
            .when((yri >= 70) & (yri <= 99), yri + 1900)
            .otherwise(yri)
        )
        date_str = F.concat(
            F.lpad(windowed.cast("string"), 4, "0"), F.lit("-"),
            F.lpad(grp("mo"), 2, "0"), F.lit("-"),
            F.lpad(grp("da"), 2, "0"),
        )
        parts.append(date_str)
    hr = grp("hr")
    if hr is not None:
        se = grp("se")
        time_str = F.concat(
            F.lpad(hr, 2, "0"), F.lit(":"),
            F.lpad(grp("mi"), 2, "0"), F.lit(":"),
            F.lpad(F.when(se.isNotNull() & (se != ""), se).otherwise(F.lit("0")), 2, "0")
            if se is not None else F.lit("00"),
        )
        ms = grp("ms")
        if ms is not None:
            time_str = F.concat(
                time_str,
                F.when(ms != "", F.concat(F.lit("."), ms)).otherwise(F.lit("")),
            )
        parts.append(time_str)
    if len(parts) == 2:
        out = F.concat(parts[0], F.lit("T"), parts[1])
    else:
        out = parts[0]
    if plan.has_tz:
        tzz, tzh, tzm = grp("tzz"), grp("tzh"), grp("tzm")
        tz = F.lit("")
        if tzh is not None:
            tz = F.when(
                tzh != "",
                F.concat(tzh, F.lit(":"),
                         F.lpad(F.when((tzm.isNotNull()) & (tzm != ""), tzm)
                                .otherwise(F.lit("0")), 2, "0")),
            ).otherwise(tz)
        if tzz is not None:
            tz = F.when(tzz == "Z", F.lit("Z")).otherwise(tz)
        out = F.concat(out, tz)
    return F.when(ok, out)


# --------------------------------------------------------------------------
# per-item typing (C6, C9, C10, C11)
# --------------------------------------------------------------------------

def _facet_errors(dt: CompiledDatatype, lex: Column, base: str) -> Column:
    """array<string> of facet violations for a typed item."""
    errs: list[Column] = []
    is_binary = base in BINARY_BASES
    if is_binary:
        decoded_len = (
            (F.length(lex) / 2).cast("int") if base == "hexBinary"
            else F.length(F.unbase64(lex))
        )
        if dt.length is not None:
            errs.append(F.when(decoded_len != dt.length,
                               F.concat(F.lit("decoded value has length != "), F.lit(str(dt.length)))))
        if dt.minLength is not None:
            errs.append(F.when(decoded_len < dt.minLength, F.lit(f"decoded length < {dt.minLength}")))
        if dt.maxLength is not None:
            errs.append(F.when(decoded_len > dt.maxLength, F.lit(f"decoded length > {dt.maxLength}")))
    else:
        if dt.length is not None:
            errs.append(F.when(F.length(lex) != dt.length, F.concat(lex, F.lit(f" does not have length {dt.length}"))))
        if dt.minLength is not None:
            errs.append(F.when(F.length(lex) < dt.minLength, F.concat(lex, F.lit(f" does not have length >= {dt.minLength}"))))
        if dt.maxLength is not None:
            errs.append(F.when(F.length(lex) > dt.maxLength, F.concat(lex, F.lit(f" does not have length <= {dt.maxLength}"))))

    # value-range facets: numeric comparison for numbers, canonical-lexical
    # (ISO-8601 sorts lexicographically) comparison for date/times
    bounds = [
        ("minimum", dt.minimum, "<"), ("minInclusive", dt.minInclusive, "<"),
        ("maximum", dt.maximum, ">"), ("maxInclusive", dt.maxInclusive, ">"),
        ("minExclusive", dt.minExclusive, "<="), ("maxExclusive", dt.maxExclusive, ">="),
    ]
    if any(b[1] is not None for b in bounds):
        if base in NUMERIC_BASES:
            val: Column = lex.cast("double")
            conv = lambda b: F.lit(float(b))  # noqa: E731
        else:
            val = lex
            conv = F.lit
        for name, bound, op in bounds:
            if bound is None:
                continue
            cond = {
                "<": val < conv(bound), "<=": val <= conv(bound),
                ">": val > conv(bound), ">=": val >= conv(bound),
            }[op]
            errs.append(F.when(cond, F.concat(lex, F.lit(f" violates {name} {bound}"))))
    if not errs:
        return F.array().cast("array<string>")
    return F.array_compact(F.array(*errs))


def _regex_ok(fmt: str) -> bool:
    """True when *fmt* compiles as a regex; an invalid regex format acts
    as if format were not set (metadata.rb:710-716 log_warn + delete)."""
    try:
        re.compile(fmt)
        return True
    except re.error:
        return False


def typed_item_expr(v: Column, col: CompiledColumn, table: CompiledTable) -> Column:
    """Type one (post-split, non-null) string item ->
    struct<lex, dt, lang, err>. On any validation error the item degrades to
    a plain (language-tagged) literal and err is set (metadata.rb:2082-2088).

    The expensive UAX-35 normalize trees (number/date) are staged through
    :func:`_let` so they evaluate once per item, not once per reference."""
    dt = col.datatype
    base = dt.base

    err_msgs: list[Column] = []
    lex: Column = v
    valid: Column = F.lit(True)

    if base in UNSUPPORTED:
        # per-value error, plain literal out (metadata.rb:2251-2253)
        valid = F.lit(False)
        err_msgs.append(F.concat(v, F.lit(f" uses unsupported datatype: {base}")))
    elif base in NUMERIC_BASES:
        fmt = dt.format if isinstance(dt.format, dict) else (
            {"pattern": dt.format} if isinstance(dt.format, str) else {})
        try:
            plan = uax35.compile_number_pattern(
                fmt.get("pattern"), fmt.get("groupChar") or ",", fmt.get("decimalChar") or ".")
        except uax35.PatternError:
            # invalid picture pattern: act as if format were not set
            # (metadata.rb:695-700 log_warn + object.delete(:format))
            plan = uax35.compile_number_pattern(
                None, fmt.get("groupChar") or ",", fmt.get("decimalChar") or ".")

        def numeric_rest(norm: Column) -> Column:
            errs: list[Column] = []
            lex = F.coalesce(norm, v)
            valid = norm.isNotNull()
            errs.append(F.when(~valid, F.concat(v, F.lit(" does not match numeric pattern"))))
            check = lexical_regex_for(base)
            if check:
                bad_lex = valid & ~lex.rlike(_java_re(check))
                valid = valid & lex.rlike(_java_re(check))
                errs.append(F.when(bad_lex, F.concat(lex, F.lit(f" is not a valid {base}"))))
            if base in INTEGER_BOUNDS:
                lo, hi = INTEGER_BOUNDS[base]
                as_num = lex.cast("decimal(38,0)")
                # bounds go through string→decimal: unsignedLong's 2^64-1
                # overflows a Java long in py4j literal conversion
                if lo is not None:
                    lo_c = F.lit(str(lo)).cast("decimal(38,0)")
                    cond = valid & (as_num < lo_c)
                    errs.append(F.when(cond, F.concat(lex, F.lit(f" is not a valid {base}"))))
                    valid = valid & (as_num >= lo_c)
                if hi is not None:
                    hi_c = F.lit(str(hi)).cast("decimal(38,0)")
                    cond = valid & (as_num > hi_c)
                    errs.append(F.when(cond, F.concat(lex, F.lit(f" is not a valid {base}"))))
                    valid = valid & (as_num <= hi_c)
            return _finish_item(v, lex, valid, errs, col)

        return _let(normalize_number_expr(v, plan), numeric_rest)
    elif base == "boolean":
        if dt.format:
            t, _, f_ = str(dt.format).partition("|")
            lex = F.when(v == t, F.lit("true")).when(v == f_, F.lit("false"))
            valid = lex.isNotNull()
            err_msgs.append(F.when(~valid, F.concat(v, F.lit(f" does not match boolean format {dt.format}"))))
            lex = F.coalesce(lex, v)
        else:
            low = F.lower(v)
            lex = (F.when(low.isin("1", "true"), F.lit("true"))
                   .when(low.isin("0", "false"), F.lit("false")))
            valid = lex.isNotNull()
            err_msgs.append(F.when(~valid, F.concat(v, F.lit(" does not match boolean"))))
            lex = F.coalesce(lex, v)
    elif base in DATE_BASES:
        plan = None
        if dt.format:
            try:
                plan = uax35.compile_date_pattern(str(dt.format))
            except uax35.PatternError:
                # invalid date/time pattern: act as if format were not set
                # (metadata.rb:701-709 log_warn + object.delete(:format))
                plan = None
        if plan is not None:
            fmt_str = str(dt.format)

            def date_rest(norm: Column) -> Column:
                errs: list[Column] = []
                lex = F.coalesce(norm, v)
                valid = norm.isNotNull()
                errs.append(F.when(~valid, F.concat(
                    v, F.lit(f" does not match format {fmt_str}"))))
                check = lexical_regex_for(base)
                if check:
                    still = valid & ~lex.rlike(_java_re(check))
                    errs.append(F.when(still, F.concat(
                        lex, F.lit(f" is not a valid {base}"))))
                    valid = valid & lex.rlike(_java_re(check))
                return _finish_item(v, lex, valid, errs, col)

            return _let(normalize_date_expr(v, plan, base), date_rest)
        check = lexical_regex_for(base)
        if check:
            still = valid & ~lex.rlike(_java_re(check))
            err_msgs.append(F.when(still, F.concat(lex, F.lit(f" is not a valid {base}"))))
            valid = valid & lex.rlike(_java_re(check))
    elif base in DURATION_BASES:
        if dt.format and _regex_ok(str(dt.format)):
            ok = v.rlike(_java_re(str(dt.format)))
            err_msgs.append(F.when(~ok, F.concat(v, F.lit(f" does not match format {dt.format}"))))
            valid = ok
        check = lexical_regex_for(base)
        if check:
            still = valid & ~v.rlike(_java_re(check))
            err_msgs.append(F.when(still, F.concat(v, F.lit(f" is not a valid {base}"))))
            valid = valid & v.rlike(_java_re(check))
    elif base in BINARY_BASES:
        check = lexical_regex_for(base)
        ok = v.rlike(_java_re(check))
        err_msgs.append(F.when(~ok, F.concat(v, F.lit(" is invalid"))))
        valid = ok
    else:
        # other types: format is a plain regex (metadata.rb:2256-2257)
        if dt.format and base not in ("json", "xml", "html") \
                and _regex_ok(str(dt.format)):
            ok = v.rlike(_java_re(str(dt.format)))
            err_msgs.append(F.when(~ok, F.concat(v, F.lit(f" does not match format {dt.format}"))))
            valid = ok
        check = lexical_regex_for(base)
        if check:
            still = valid & ~v.rlike(_java_re(check))
            err_msgs.append(F.when(still, F.concat(v, F.lit(f" is not a valid {base}"))))
            valid = valid & v.rlike(_java_re(check))

    return _finish_item(v, lex, valid, err_msgs, col)


def _finish_item(v: Column, lex: Column, valid: Column,
                 err_msgs: list[Column], col: CompiledColumn) -> Column:
    """Shared item tail: facet checks over the (already cheap) *lex*,
    typed-vs-plain struct choice, error-string assembly."""
    dt = col.datatype
    base = dt.base
    dt_iri = dt.iri
    lang = None if col.lang in (None, "und") else col.lang
    plain = F.struct(
        v.alias("lex"), F.lit(None).cast("string").alias("dt"),
        F.lit(lang).cast("string").alias("lang"),
    )

    facet_errs = _facet_errors(dt, lex, base)
    has_facet_err = F.size(facet_errs) > 0

    # xsd:string stays a (language-tagged) plain literal (metadata.rb:2262-2268)
    typed_dt = None if (dt.id is None and dt_iri == XSD + "string") else dt_iri
    typed = F.struct(
        lex.alias("lex"),
        F.lit(typed_dt).cast("string").alias("dt"),
        (F.lit(lang) if typed_dt is None else F.lit(None)).cast("string").alias("lang"),
    )

    all_errs = F.array_compact(F.array(*err_msgs)) if err_msgs else F.array().cast("array<string>")
    all_errs = F.concat(all_errs, facet_errs)
    err_str = F.when(F.size(all_errs) > 0, F.array_join(all_errs, "\n"))

    item_ok = valid & ~has_facet_err
    return (
        F.when(item_ok, typed.withField("err", F.lit(None).cast("string")))
        .otherwise(plain.withField("err", err_str))
    )


# --------------------------------------------------------------------------
# whole-cell pipeline (C1-C5, C10)
# --------------------------------------------------------------------------

def _dialect_trim(raw: Column, table: CompiledTable) -> Column:
    mode = table.dialect.effective_trim
    if mode == "true":
        return F.trim(raw)
    if mode == "start":
        return F.ltrim(raw)
    if mode == "end":
        return F.rtrim(raw)
    return raw


def cell_expr(raw: Column, col: CompiledColumn, table: CompiledTable) -> Column:
    """Full cell pipeline for one column -> the cell struct."""
    base = col.datatype.base

    if col.virtual:
        # virtual columns have no physical value: a null cell (metadata.rb:2044-2051)
        value = F.lit(None).cast("string")
    else:
        value = _dialect_trim(F.coalesce(raw, F.lit("")), table)
        if base not in NO_WS_REPLACE:
            value = F.regexp_replace(value, "[\r\n\t]", " ")
        if base not in NO_WS_COLLAPSE:
            value = F.regexp_replace(F.trim(value), r"\s+", " ")
        # default on empty (C3)
        value = F.when(value == "", F.lit(col.default)).otherwise(value)

    if col.separator:
        items = F.split(value, re.escape(col.separator), -1)
        # Ruby String#split semantics (metadata.rb:2073): trailing empty
        # strings are dropped and splitting the empty string yields [] —
        # which is also how the model's "empty string -> empty list" rule
        # is realized. Keep interior empties (they take default/null).
        last_nonempty = F.aggregate(
            F.transform(items, lambda x, i: F.when(x != "", i + 1).otherwise(F.lit(0))),
            F.lit(0), lambda acc, v: F.greatest(acc, v))
        items = F.slice(items, F.lit(1), last_nonempty)
    else:
        items = F.array(value)

    def per_item(x: Column) -> Column:
        if base not in NO_ITEM_STRIP:
            x = F.trim(x)
        x = F.when(x == "", F.lit(col.default)).otherwise(x)
        if col.null:
            x = F.when(x.isin(*col.null), F.lit(None)).otherwise(x)
        return x

    items = F.transform(items, per_item)
    items = F.when(value.isNull(), F.array().cast("array<string>")).otherwise(items)
    return F.transform(
        F.array_compact(items), lambda x: typed_item_expr(x, col, table))


# -- cheap accessors over the materialized cell column ----------------------
# The cell column holds ONLY the typed-values array; everything else derives
# from it with tiny expressions over the column *attribute*, so the big
# typing tree exists exactly once per column in the plan (expression-size
# discipline: a 10-column table must not serialize a 10^6-node plan).

def cell_values(name: str) -> Column:
    # backtick-quoted: defaulted names like `_col.1` contain a dot, which a
    # bare F.col would parse as a struct-field access
    return F.col("`cell_" + name.replace("`", "``") + "`")


def cell_errors_expr(col: CompiledColumn) -> Column:
    values = cell_values(col.name)
    errors = F.array_compact(F.transform(values, lambda t: t["err"]))
    if col.required:
        empty_err = F.when(
            (F.size(values) == 0) | F.exists(values, lambda t: t["lex"] == ""),
            F.lit("Required column has empty value(s)"),
        )
        errors = F.concat(errors, F.array_compact(F.array(empty_err)))
    return errors


def cell_binding(col: CompiledColumn) -> Column:
    """Template variable value: first value's lexical form (or all values
    comma-joined for separator columns happens at the template layer)."""
    return F.coalesce(F.try_element_at(cell_values(col.name), F.lit(1))["lex"], F.lit(""))


def cell_binding_arr(col: CompiledColumn) -> Column:
    return F.transform(cell_values(col.name), lambda t: t["lex"])


def build_cells(df: DataFrame, table: CompiledTable) -> DataFrame:
    """Attach one ``cell_<name>`` column per schema column — the typed-values
    array ``array<struct<lex,dt,lang,err>>``.

    Expects physical columns ``_c0.._cN`` (post-skipColumns raw strings) plus
    ``_row`` / ``_sourceRow``; virtual columns need no physical input."""
    names = [c.name for c in table.columns]
    if len(set(names)) != len(names):
        # the reference errors on this at validate! time (metadata.rb:599
        # 'must have unique names'); here it would surface as an opaque
        # Catalyst AMBIGUOUS_REFERENCE several operators later
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"column names are not unique: {dupes}")
    cells = []
    for col in table.columns:
        if col.virtual:
            raw = F.lit(None).cast("string")
        else:
            raw = F.col(f"_c{col.number - 1}")
        cells.append(cell_expr(raw, col, table).alias(f"cell_{col.name}"))
    return df.select("*", *cells)
