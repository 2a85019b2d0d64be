"""UAX-35 (Unicode TR35) number- and date-pattern compilers.

These run on the **driver** at schema-compile time and produce plain regex
strings + small normalization plans; all per-value matching happens
executor-side via native ``rlike`` / ``regexp_extract`` / ``regexp_replace``
column expressions (see ``operators/cells.py``). No per-row Python.

Semantics follow the W3C CSVW datatype-format rules as implemented by the
reference (rdf-tabular ``lib/rdf/tabular/uax35.rb``); behavioral parity is
pinned by the ported spec tables in ``tests/test_uax35.py``
(reference spec/metadata_spec.rb:1400-1491, spec/uax35_spec.rb).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class PatternError(ValueError):
    """Raised when a number/date picture pattern is itself invalid."""


# --------------------------------------------------------------------------
# Number patterns
# --------------------------------------------------------------------------

#: validation regex used when a numeric column declares no picture pattern
def default_number_regex(group_char: str = ",", decimal_char: str = ".") -> str:
    g = re.escape(group_char)
    d = re.escape(decimal_char)
    return (
        r"^([+-]?"
        rf"[\d{g}]+"
        rf"(?:{d}[\d{g}]+"
        r"(?:[Ee][+-]?\d+)?"
        r")?[%‰]?"
        r"|NAN|INF|-INF)$"
    )


@dataclass(frozen=True)
class NumberPlan:
    """Compiled numeric picture pattern.

    ``regex`` validates the raw (whitespace-collapsed, upper-cased) value;
    normalization then strips the literal ``prefix``/``suffix`` affixes
    (display text like a currency code — %/‰ stay for the shift), removes
    ``group_char``, maps ``decimal_char`` to '.', applies the %/‰ decimal
    shift and E->e / NAN->NaN fixes.

    Affix stripping is a DELIBERATE divergence from the reference, which
    keeps the matched prefix inside the typed value ("USD 1,234.50" with
    pattern "USD #,##0.00" -> ill-formed "USD1234.50"^^xsd:decimal,
    uax35.rb:206-211); the UAX-35 reading is that affixes are display
    text and the numeric value excludes them — the same principle the
    reference itself applies to %/‰.
    """

    regex: str
    group_char: str = ","
    decimal_char: str = "."
    pattern: str | None = None
    prefix: str = ""
    suffix: str = ""


def _analyze_grouped_digits(part: str, group_char: str) -> tuple[int, int, int, int]:
    """Return (min_digits, all_digits, primary_group, secondary_group)."""
    bare = part.replace(group_char, "")
    min_digits = bare.count("0")
    all_digits = len(bare)
    groups = part.split(group_char)[1:]
    # adjacent or trailing separators mean a zero-size group — malformed
    # picture (would compile to an invalid \d{1,0} repetition)
    if any(not gp for gp in groups):
        raise PatternError(f"empty digit group in number pattern {part!r}")
    primary = len(groups[-1]) if groups else 0
    secondary = primary if len(groups) <= 1 else len(groups[-2])
    return min_digits, all_digits, primary, secondary


def _integer_regex(int_part: str, group_char: str) -> str:
    """Regex for the integer part of a UAX-35 mantissa, honoring grouping."""
    g = re.escape(group_char)
    min_d, all_d, primary, secondary = _analyze_grouped_digits(int_part, group_char)
    if all_d == min_d:
        # a pattern of only-required digits still admits extra leading digits
        all_d += 1
    if primary == 0:
        return rf"\d{{{min_d},}}"

    # required groups: peel groups off the right until min digits consumed
    required: list[str] = []
    rem = 0
    size = primary
    while min_d > 0:
        take = min(size, min_d)
        rem = size - take
        required.append(rf"\d{{{take}}}")
        min_d -= take
        all_d -= take
        size = secondary
    required_str = g.join(reversed(required))

    if all_d <= 0:
        return required_str

    # optional leading digits, completing the partially-filled group first,
    # then unlimited additional groups of the secondary size
    lead: list[str] = ["\\d"] * rem
    if secondary != size:
        size = secondary
        lead.append("\\d" + g)
        lead.extend(["\\d"] * (size - 1))
    if not lead:
        opt = rf"(?:\d{{1,{size}}}{g})?(?:\d{{{size}}}{g})*"
    else:
        lead[-1] = rf"(?:\d{{1,{size}}}{g})?(?:\d{{{size}}}{g})*" + lead[-1]
        opt = ""
        for piece in reversed(lead):
            opt = f"(?:{opt}{piece})?"
    return opt + required_str


def _fraction_regex(frac_part: str, group_char: str, decimal_char: str) -> str:
    """Regex for the fractional part (may be grouped), '' if absent."""
    if not frac_part:
        return ""
    g = re.escape(group_char)
    d = re.escape(decimal_char)
    bare = frac_part.replace(group_char, "")
    min_d = bare.count("0")
    max_d = len(bare)
    groups = frac_part.split(group_char)[:-1]
    gsize = len(groups[0]) if groups else 0

    if gsize == 0:
        body = rf"\d{{{max_d}}}" if min_d == max_d else rf"\d{{{min_d},{max_d}}}"
    else:
        required: list[str] = []
        rem = 0
        md, xd = min_d, max_d
        while md > 0:
            take = min(gsize, md)
            rem = gsize - take
            required.append(rf"\d{{{take}}}")
            md -= take
            xd -= take
        required_str = g.join(required)
        tail: list[str] = []
        r = rem
        while xd > 0:
            tail.append(g + "\\d" if r == 0 else "\\d")
            xd -= 1
            r = (r - 1) % gsize
        opt = ""
        for piece in reversed(tail):
            opt = f"(?:{piece}{opt})?"
        body = required_str + opt

    out = d + body
    if max_d > 0 and min_d == 0:
        out = f"(?:{out})?"
    return out


def _exponent_regex(exp_part: str) -> str:
    if not exp_part:
        return ""
    sign = exp_part[0] if exp_part[:1] in "+-" else None
    bare = exp_part.lstrip("+-")
    min_d = bare.count("0")
    max_d = len(bare)
    if max_d == 0:
        return ""
    sign_re = re.escape(sign) if sign else "[+-]?"
    digits = rf"\d{{{max_d}}}" if max_d == min_d else rf"\d{{{min_d},{max_d}}}"
    return f"E{sign_re}{digits}"


def build_number_regex(
    pattern: str | None, group_char: str = ",", decimal_char: str = "."
) -> str:
    """Compile a UAX-35 number picture pattern into an anchored validation
    regex (Java- and Python-compatible: no named groups, no lookbehind)."""
    if pattern is None:
        return default_number_regex(group_char, decimal_char)

    g = re.escape(group_char)
    d = re.escape(decimal_char)
    numeric_re = (
        rf"(?:\#|{g})*(?:0|{g})*"
        rf"(?:{d}(?:0|{g})*(?:\#|{g})*"
        rf"(?:E[+-]?(?:\#|{g})*(?:0|{g})*)?"
        r")?"
    )
    m = re.match(rf"^(?P<prefix>[^#0]*)(?P<num>{numeric_re})(?P<suffix>.*)$", pattern)
    if not m or not m.group("num"):
        raise PatternError(f"unrecognized number pattern {pattern!r}")
    prefix, num, suffix = m.group("prefix"), m.group("num"), m.group("suffix")

    prefix_re = re.escape(prefix) if prefix else ""
    if not re.search(r"[+-]", prefix):
        prefix_re += "[+-]?"
    suffix_re = re.escape(suffix) if suffix else ""

    mant, _, exp = num.partition("E")
    mant_parts = mant.split(decimal_char)
    if len(mant_parts) > 2:
        raise PatternError(f"multiple decimal separators in {pattern!r}")
    int_part = mant_parts[0]
    frac_part = mant_parts[1] if len(mant_parts) == 2 else ""

    body = (
        _integer_regex(int_part, group_char)
        + _fraction_regex(frac_part, group_char, decimal_char)
        + _exponent_regex(exp)
    )
    return f"^(?:{prefix_re})(?:{body})(?:{suffix_re})$"


def _affix_literals(pattern: str | None, group_char: str,
                    decimal_char: str) -> tuple[str, str]:
    """The literal prefix/suffix text of a picture pattern, whitespace-
    collapsed and with %/‰ removed (those stay in the value for the
    decimal shift)."""
    if pattern is None:
        return "", ""
    g = re.escape(group_char)
    d = re.escape(decimal_char)
    numeric_re = (
        rf"(?:\#|{g})*(?:0|{g})*"
        rf"(?:{d}(?:0|{g})*(?:\#|{g})*"
        rf"(?:E[+-]?(?:\#|{g})*(?:0|{g})*)?"
        r")?"
    )
    m = re.match(rf"^(?P<prefix>[^#0]*)(?P<num>{numeric_re})(?P<suffix>.*)$",
                 pattern)
    if not m or not m.group("num"):
        return "", ""

    def clean(s: str) -> str:
        return re.sub(r"[\s%‰]", "", s)

    return clean(m.group("prefix")), clean(m.group("suffix"))


def compile_number_pattern(
    pattern: str | None, group_char: str = ",", decimal_char: str = "."
) -> NumberPlan:
    prefix, suffix = _affix_literals(pattern, group_char, decimal_char)
    return NumberPlan(
        regex=build_number_regex(pattern, group_char, decimal_char),
        group_char=group_char,
        decimal_char=decimal_char,
        pattern=pattern,
        prefix=prefix,
        suffix=suffix,
    )


def normalize_number(value: str, plan: NumberPlan) -> str | None:
    """Pure-Python reference implementation of the executor-side number
    normalization (used for tests and driver-side constant folding).
    Returns the canonical-ish lexical value or None if it fails to match."""
    if value is None:
        return None
    if len(plan.group_char) == 1 and plan.group_char * 2 in value:
        return None
    v = value.upper()
    if not re.match(plan.regex, v):
        return None
    v = re.sub(r"\s+", "", v)
    # strip literal display affixes (see NumberPlan docstring); the match
    # above anchored them, so plain removal is exact
    if plan.prefix and v.startswith(plan.prefix.upper()):
        v = v[len(plan.prefix):]
    if plan.suffix and v.endswith(plan.suffix.upper()):
        v = v[: -len(plan.suffix)]
    v = v.replace(plan.group_char, "").replace(plan.decimal_char, ".")
    return shift_pct_permille(v)


def shift_pct_permille(v: str) -> str:
    """Apply %/‰ decimal shift + NaN/e normalization to a cleaned
    numeric string (group chars removed, '.' decimal)."""
    for sym, k in (("%", 2), ("‰", 3)):
        if sym in v:
            v = v.replace(sym, "")
            sign = ""
            if v[:1] in "+-":
                sign, v = v[0], v[1:]
            lhs, dot, rhs = v.partition(".")
            if len(lhs) <= k:
                out = "0." + "0" * (k - len(lhs)) + lhs + rhs
            else:
                out = lhs[:-k] + "." + lhs[-k:] + rhs
            return sign + out.replace("E", "e")
    if "NAN" in v:
        return v.replace("NAN", "NaN")
    return v.replace("E", "e")


# --------------------------------------------------------------------------
# Date / time patterns
# --------------------------------------------------------------------------

# separated date patterns: token -> (regex-with-3-groups, field order, year token)
_DATE_PATTERNS: dict[str, tuple[str, tuple[str, str, str], str]] = {}
for _sep in ("-", "/", "."):
    _e = re.escape(_sep)
    for _d, _m, _y in (
        ("dd", "MM", "yyyy"), ("d", "M", "yyyy"), ("d", "M", "yy"), ("d", "M", "y"),
    ):
        _dr = rf"(\d{{{len(_d)},2}})" if len(_d) == 1 else r"(\d{2})"
        _mr = rf"(\d{{{len(_m)},2}})" if len(_m) == 1 else r"(\d{2})"
        _yr = {"yyyy": r"(\d{4})", "yy": r"(\d{2})", "y": r"(\d{1,4})"}[_y]
        _DATE_PATTERNS[f"{_d}{_sep}{_m}{_sep}{_y}"] = (
            f"{_dr}{_e}{_mr}{_e}{_yr}", ("da", "mo", "yr"), _y)
        _DATE_PATTERNS[f"{_m}{_sep}{_d}{_sep}{_y}"] = (
            f"{_mr}{_e}{_dr}{_e}{_yr}", ("mo", "da", "yr"), _y)


_TIME_PATTERNS: dict[str, str] = {
    "HH:mm:ss": r"(\d{2}):(\d{2}):(\d{2})",
    "HHmmss": r"(\d{2})(\d{2})(\d{2})",
    "HH:mm": r"(\d{2}):(\d{2})",
    "HHmm": r"(\d{2})(\d{2})",
}

_TZ_PATTERNS: dict[str, str] = {
    "x": r"([+-]\d{2})(\d{2})?",
    "X": r"(?:([+-]\d{2})(\d{2})?|(Z))",
    "xx": r"([+-]\d{2})(\d{2})",
    "XX": r"(?:([+-]\d{2})(\d{2})|(Z))",
    "xxx": r"([+-]\d{2}):(\d{2})",
    "XXX": r"(?:([+-]\d{2}):(\d{2})|(Z))",
}


@dataclass(frozen=True)
class DatePlan:
    """Compiled date/time picture pattern.

    ``regex`` is anchored with positional capture groups; ``groups`` maps
    component name -> 1-based group index. Components: yr, mo, da, hr, mi,
    se, ms, tzh, tzm, tzz. ``two_digit_year``: apply the 70/100 windowing.
    """

    regex: str
    groups: dict[str, int] = field(default_factory=dict)
    has_date: bool = False
    has_time: bool = False
    has_tz: bool = False
    two_digit_year: bool = False
    pattern: str | None = None


def compile_date_pattern(pattern: str) -> DatePlan:
    """Compile a CSVW date/time picture pattern (the fixed UAX-35 menu the
    spec admits) into a single anchored regex + component-group map."""
    if pattern is None:
        raise PatternError("no pattern")
    orig = pattern
    tz_pattern = None
    m = re.match(r"^(.*[dyms])(\s*[xX]+)$", pattern)
    if m:
        pattern, tz_pattern = m.group(1), m.group(2)

    parts = pattern.split(" ")
    date_pattern: str | None = parts[0]
    time_pattern: str | None = parts[1] if len(parts) > 1 else None
    if time_pattern is None and not re.search(r"[TyMd]", date_pattern):
        date_pattern, time_pattern = None, date_pattern

    groups: dict[str, int] = {}
    regex = "^"
    n = 0

    def add(names: list[str], piece: str, ngroups: int) -> None:
        nonlocal regex, n
        regex += piece
        for i, name in enumerate(names):
            if name:
                groups[name] = n + 1 + i
        n += ngroups

    two_digit_year = False
    if date_pattern is not None:
        if date_pattern in ("yyyy-MM-dd", "yyyyMMdd"):
            sep = "-" if "-" in date_pattern else ""
            e = re.escape(sep)
            add(["yr", "mo", "da"], rf"(\d{{4}}){e}(\d{{2}}){e}(\d{{2}})", 3)
        elif date_pattern in _DATE_PATTERNS:
            piece, order, yr_tok = _DATE_PATTERNS[date_pattern]
            add(list(order), piece, 3)
            two_digit_year = len(yr_tok) < 4
        elif date_pattern == "yyyy-MM-ddTHH:mm":
            add(["yr", "mo", "da", "hr", "mi"],
                r"(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2})", 5)
        elif date_pattern == "yyyy-MM-ddTHH:mm:ss":
            add(["yr", "mo", "da", "hr", "mi", "se"],
                r"(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})", 6)
        elif re.fullmatch(r"yyyy-MM-ddTHH:mm:ss\.S+", date_pattern):
            nms = date_pattern.count("S")
            add(["yr", "mo", "da", "hr", "mi", "se", "ms"],
                rf"(\d{{4}})-(\d{{2}})-(\d{{2}})T(\d{{2}}):(\d{{2}}):(\d{{2}})\.(\d{{1,{nms}}})",
                7)
        else:
            raise PatternError(f"unrecognized date pattern {date_pattern!r}")

    if time_pattern is not None:
        if date_pattern is not None:
            regex += " ?"
        if time_pattern in _TIME_PATTERNS:
            names = {"HH:mm:ss": ["hr", "mi", "se"], "HHmmss": ["hr", "mi", "se"],
                     "HH:mm": ["hr", "mi"], "HHmm": ["hr", "mi"]}[time_pattern]
            add(names, _TIME_PATTERNS[time_pattern], len(names))
        elif re.fullmatch(r"HH:mm:ss\.S+", time_pattern):
            nms = time_pattern.count("S")
            add(["hr", "mi", "se", "ms"],
                rf"(\d{{2}}):(\d{{2}}):(\d{{2}})\.(\d{{1,{nms}}})", 4)
        else:
            raise PatternError(f"unrecognized time pattern {time_pattern!r}")

    if tz_pattern is not None:
        tz_key = tz_pattern.lstrip()
        if tz_key not in _TZ_PATTERNS:
            raise PatternError(f"unrecognized timezone pattern {tz_key!r}")
        if tz_pattern.startswith(" "):
            regex += " ?"
        piece = _TZ_PATTERNS[tz_key]
        names = ["tzh", "tzm"] + (["tzz"] if "Z" in piece else [])
        add(names, piece, len(names))

    regex += "$"
    return DatePlan(
        regex=regex,
        groups=groups,
        has_date=date_pattern is not None,
        has_time=(time_pattern is not None)
        or (date_pattern is not None and "hr" in groups),
        has_tz=tz_pattern is not None,
        two_digit_year=two_digit_year,
        pattern=orig,
    )


def window_year(yr: int, literal_len: int) -> int:
    """Two-digit-year windowing: <=69 -> 2000s, 70-99 -> 1900s,
    100-999 -> +2000 (reference uax35.rb:160-168)."""
    if literal_len >= 4:
        return yr
    if 0 <= yr <= 69 or 100 <= yr <= 999:
        return yr + 2000
    if 70 <= yr <= 99:
        return yr + 1900
    return yr


def normalize_date(value: str, plan: DatePlan) -> str | None:
    """Pure-Python reference implementation of date normalization to the
    XSD lexical form; executor-side mirror lives in operators/cells.py."""
    m = re.match(plan.regex, value or "")
    if not m:
        return None

    def g(name: str) -> str | None:
        idx = plan.groups.get(name)
        return m.group(idx) if idx else None

    out_date = None
    if g("yr") is not None:
        yr = window_year(int(g("yr")), len(g("yr")))
        out_date = f"{yr:04d}-{int(g('mo')):02d}-{int(g('da')):02d}"
    out_time = None
    if g("hr") is not None:
        se = int(g("se")) if g("se") else 0
        out_time = f"{int(g('hr')):02d}:{int(g('mi')):02d}:{se:02d}"
        if g("ms"):
            out_time += f".{g('ms')}"
    out = "T".join([p for p in (out_date, out_time) if p is not None])
    if plan.has_tz:
        if g("tzz"):
            out += "Z"
        elif g("tzh"):
            out += f"{g('tzh')}:{int(g('tzm') or 0):02d}"
    return out
