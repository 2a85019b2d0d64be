"""RFC 6570 URI-template compiler.

CSVW expands ``aboutUrl`` / ``propertyUrl`` / ``valueUrl`` templates per row
with variables bound to cell values plus ``_row/_sourceRow/_name/_column/
_sourceColumn`` (reference metadata.rb:1950-1962).

Two paths:

- :func:`compile_template` — the common forms (``{var}``, ``{+var}``,
  ``{#var}``, multiple vars, literals) compile to **native Spark column
  expressions** (concat + percent-encode), staying inside codegen.
- :func:`expand` — a pure-Python RFC 6570 expander covering all operators;
  used for driver-side constant folding, tests, and as the pandas-UDF
  fallback for exotic operators (``{/x*}``, ``{?x}``, ...).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_EXPR_RE = re.compile(r"\{([+#./;?&]?)([^}]*)\}")

_UNRESERVED = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
_RESERVED = ":/?#[]@!$&'()*+,;="


_HEX_DIGITS = set("0123456789abcdefABCDEF")


def _pct(s: str, keep_reserved: bool) -> str:
    s = str(s)
    safe = _UNRESERVED + (_RESERVED if keep_reserved else "")
    out = []
    for i, ch in enumerate(s):
        if ch == "%" and keep_reserved:
            # RFC 6570 §3.2.3: only a valid pct-triplet passes through in
            # reserved expansion; a bare '%' must be encoded as %25
            if s[i + 1 : i + 2] in _HEX_DIGITS and s[i + 2 : i + 3] in _HEX_DIGITS:
                out.append("%")
            else:
                out.append("%25")
        elif ch in safe:
            out.append(ch)
        else:
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
    return "".join(out)


@dataclass(frozen=True)
class _Var:
    name: str
    explode: bool = False
    prefix: int | None = None


_OPS = {
    # op: (first, sep, named, ifemp, allow_reserved)
    "": ("", ",", False, "", False),
    "+": ("", ",", False, "", True),
    "#": ("#", ",", False, "", True),
    ".": (".", ".", False, "", False),
    "/": ("/", "/", False, "", False),
    ";": (";", ";", True, "", False),
    "?": ("?", "&", True, "=", False),
    "&": ("&", "&", True, "=", False),
}


def _parse_varlist(spec: str) -> list[_Var]:
    out = []
    for piece in spec.split(","):
        piece = piece.strip()
        explode = piece.endswith("*")
        piece = piece.rstrip("*")
        prefix = None
        if ":" in piece:
            piece, _, n = piece.partition(":")
            prefix = int(n)
        out.append(_Var(piece, explode, prefix))
    return out


def expand(template: str, bindings: dict) -> str:
    """Full pure-Python RFC 6570 expansion (levels 1-4)."""

    def repl(m: re.Match) -> str:
        op, spec = m.group(1), m.group(2)
        first, sep, named, ifemp, allow_res = _OPS[op]
        parts: list[str] = []
        for var in _parse_varlist(spec):
            if var.name not in bindings or bindings[var.name] is None:
                continue
            val = bindings[var.name]
            if isinstance(val, (list, tuple)):
                if not val:
                    continue
                if var.explode:
                    items = [_pct(v, allow_res) for v in val]
                    if named:
                        parts.extend(f"{var.name}={i}" for i in items)
                    else:
                        parts.extend(items)
                else:
                    joined = ",".join(_pct(v, allow_res) for v in val)
                    parts.append(f"{var.name}={joined}" if named else joined)
            elif isinstance(val, dict):
                if var.explode:
                    parts.extend(
                        f"{_pct(k, allow_res)}={_pct(v, allow_res)}"
                        for k, v in val.items())
                else:
                    joined = ",".join(
                        f"{_pct(k, allow_res)},{_pct(v, allow_res)}"
                        for k, v in val.items())
                    parts.append(f"{var.name}={joined}" if named else joined)
            else:
                s = str(val)
                if var.prefix is not None:
                    s = s[: var.prefix]
                enc = _pct(s, allow_res)
                if named:
                    parts.append(f"{var.name}{ifemp}" if s == "" else f"{var.name}={enc}")
                else:
                    parts.append(enc)
        if not parts:
            return ""
        return first + sep.join(parts)

    return _EXPR_RE.sub(repl, template)


def template_variables(template: str) -> list[str]:
    names: list[str] = []
    for m in _EXPR_RE.finditer(template):
        names.extend(v.name for v in _parse_varlist(m.group(2)))
    return names


def is_native_compilable(template: str) -> bool:
    """True when every expression uses only the simple/+/# operators with
    single non-exploded, non-prefixed variables — the native Spark path."""
    for m in _EXPR_RE.finditer(template):
        if m.group(1) not in ("", "+", "#"):
            return False
        for v in _parse_varlist(m.group(2)):
            if v.explode or v.prefix is not None:
                return False
    return True


#: reserved char -> its Java URLEncoder escape (for the +/# un-encode pass).
#: '*' is absent: URLEncoder leaves it literal, which reserved expansion wants.
_RESERVED_ESCAPES = [
    (":", "%3A"), ("/", "%2F"), ("?", "%3F"), ("#", "%23"), ("[", "%5B"),
    ("]", "%5D"), ("@", "%40"), ("!", "%21"), ("$", "%24"), ("&", "%26"),
    ("'", "%27"), ("(", "%28"), (")", "%29"), ("+", "%2B"), (",", "%2C"),
    (";", "%3B"), ("=", "%3D"),
]


def pct_encode_col(col: Column, keep_reserved: bool) -> Column:
    """Percent-encode a string column RFC6570-style, JVM-side.

    ``url_encode`` is form-encoding; patch its deltas (space->'+', '~'
    escaped, '*' kept) back to RFC 3986 semantics. For the +/# operators the
    reserved set (and existing %XX triplets) passes through, but everything
    else — spaces, non-ASCII — must still be encoded (RFC 6570 §3.2.3), so
    we fully encode then un-encode the reserved characters."""
    enc = F.url_encode(col)
    enc = F.replace(enc, F.lit("+"), F.lit("%20"))  # '+' here is a space
    enc = F.replace(enc, F.lit("%7E"), F.lit("~"))
    if keep_reserved:
        for ch, esc in _RESERVED_ESCAPES:
            enc = F.replace(enc, F.lit(esc), F.lit(ch))
        # %25 last, and only when a valid pct-triplet follows: "%41" in the
        # input passes through as %41, but a bare '%' ("100%") must stay
        # %25 (RFC 6570 §3.2.3) — byte-parity with _pct above
        enc = F.regexp_replace(enc, r"%25([0-9A-Fa-f]{2})", r"%$1")
    else:
        enc = F.replace(enc, F.lit("*"), F.lit("%2A"))
    return enc


def compile_template(template: str, bindings: dict[str, Column]) -> Column:
    """Compile an RFC 6570 template to a Spark column expression.

    *bindings* maps variable name -> string Column (already the cell's
    canonical lexical value). Unbound variables expand to ''. Templates the
    native path can't express must be routed by the caller to the pandas-UDF
    fallback (see :func:`is_native_compilable`)."""
    pieces: list[Column] = []
    pos = 0
    for m in _EXPR_RE.finditer(template):
        if m.start() > pos:
            pieces.append(F.lit(template[pos : m.start()]))
        op, spec = m.group(1), m.group(2)
        keep_reserved = op in ("+", "#")
        var_cols: list[Column] = []
        for var in _parse_varlist(spec):
            if var.name not in bindings:
                continue
            var_cols.append(
                F.coalesce(pct_encode_col(bindings[var.name], keep_reserved), F.lit("")))
        if var_cols:
            body = F.concat_ws(",", *var_cols)
            pieces.append(F.concat(F.lit(op if op == "#" else ""), body))
        pos = m.end()
    if pos < len(template):
        pieces.append(F.lit(template[pos:]))
    if not pieces:
        return F.lit("")
    return F.concat(*pieces)
