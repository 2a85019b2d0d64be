"""SPARQL text front-end: parse a query string, execute on the triple
table through the existing BGP layer.

The reference emits RDF *for* downstream SPARQL engines (README.md's
"use a SPARQL engine on the emitted graph" workflow); kg/query.py gives
that workflow a Spark-native home as a programmatic API. This module
closes the loop: a user can hand the engine the SPARQL **string** they
would have run elsewhere, and it compiles onto the same DataFrame plans
— every operator here is one of kg/query.py's already-audited shapes
(filtered scans joined on shared variables, left joins for OPTIONAL,
anti/semi joins for MINUS/EXISTS, hash aggregation for GROUP BY,
TakeOrderedAndProject for ORDER+LIMIT). Nothing in this file touches
data: parsing is driver-side string work; execution is Catalyst's.

Supported surface (SPARQL 1.1 Query, pragmatic subset)
------------------------------------------------------
* ``PREFIX`` / ``BASE`` prologue; prefixed names expand to full IRIs.
  An *undeclared* prefix is kept verbatim — the engine's triple tables
  (and this repo's code-KG) store compact ``kg:dep``-style terms, so
  ``?m kg:dep ?x`` with no prologue matches them directly.
* ``SELECT [DISTINCT|REDUCED] (?v | (expr AS ?v) | *) WHERE { … }``
  with ``GROUP BY`` / ``HAVING`` / ``ORDER BY`` / ``LIMIT`` / ``OFFSET``.
* ``ASK { … }``, ``CONSTRUCT { template } WHERE { … }`` (and the
  §16.2.4 shorthand ``CONSTRUCT WHERE { pattern }``),
  ``DESCRIBE <iri>… [WHERE { … }]`` (CBD, kg/query.describe).
* Group graph patterns: triple blocks with ``;`` / ``,`` / ``a``,
  ``FILTER`` (expression or ``[NOT] EXISTS { … }``), ``OPTIONAL { … }``,
  ``{ … } UNION { … }``, ``MINUS { … }``, ``BIND(expr AS ?v)``,
  ``VALUES`` (single- and multi-variable forms), nested groups and
  sub-``SELECT``.
* Property paths: ``^p``, ``p|q``, ``p/q``, ``p+``, ``p*``, ``p?``,
  ``!(p|^q)`` (mixed forward/inverse members rewrite to the §9.1
  union of two negated scans), and modifiers on parenthesized groups —
  ``(p|^q)+``
  closes the union edge set, ``(p/q)+`` the composed edge set —
  straight onto kg/query.py's path forms (sequence = ("/", …) tuple,
  sequence closure = (mod, …) tuple, others = string affixes).
* FILTER/BIND expressions compile to Spark SQL: comparisons,
  arithmetic, ``&&``/``||``/``!``, ``IN``, and the builtins BOUND,
  REGEX, STR, LANG, LANGMATCHES, DATATYPE, isIRI/isURI, isLITERAL,
  isBLANK, STRSTARTS, STRENDS, CONTAINS, STRLEN, STRBEFORE, STRAFTER,
  UCASE, LCASE, SUBSTR, CONCAT, REPLACE, ABS, CEIL, FLOOR, ROUND, IF,
  COALESCE, sameTerm, isNumeric, IRI/URI (base-resolving), ENCODE_FOR_URI,
  MD5/SHA1/SHA256/SHA384/SHA512, the XPath dateTime accessors
  YEAR/MONTH/DAY/HOURS/MINUTES/SECONDS/TZ/TIMEZONE (over the lexical
  form — the literal's own timezone, per spec), and STRDT/STRLANG as
  lexical forms
  (BIND'd variables carry no term metadata — the literal-matching
  divergence below). Term-metadata builtins (LANG/DATATYPE/is*) ride
  the ``term_meta`` columns of kg/query.match_bgp — plain projections
  of the scan, no join, no UDF. Aggregates: COUNT(*) / COUNT(DISTINCT
  *) (distinct SOLUTIONS over the in-scope variables — r5) /
  COUNT([DISTINCT] ?v), SUM, AVG, MIN, MAX, SAMPLE, GROUP_CONCAT(?v;
  SEPARATOR "s") — every aggregate takes full EXPRESSION arguments
  (``SUM(?x * ?y)``, ``AVG(?a + 1)``; r5), with arithmetic operands
  coerced into double's value space (see ``_num``).

Documented divergences (all deterministic, all narrowing):
* Literal constants in triple patterns match by lexical form (the
  engine's term model stores one text column + metadata; use FILTER
  with LANG()/DATATYPE() to discriminate typed/tagged literals).
* ``SAMPLE`` returns ``min`` and ``GROUP_CONCAT`` sorts its inputs —
  SPARQL leaves both nondeterministic; a distributed engine must not.
* ``REDUCED`` is treated as ``DISTINCT`` (permitted by the spec).
* Blank-node labels, ``[ … ]`` property lists and ``( … )``
  collections in WHERE patterns desugar to fresh non-projectable
  variables (SPARQL §4.1.4/§4.2; collections use the declared ``rdf:``
  prefix or the compact ``rdf:first``/``rdf:rest``/``rdf:nil`` terms);
  in CONSTRUCT templates all three are rejected loudly.

Scale: identical to the programmatic API — the parser only *selects*
among kg/query.py's plans. Pattern-join order follows the written
query; pass ``reorder=True`` to apply the stats-free selectivity
heuristic (kg/query.reorder_patterns) to each triple block.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .query import (DEFAULT_PATH_MAX_HOPS, describe, match_bgp,
                    solution_modifiers)

# --------------------------------------------------------------- lexer

_TOKEN_RE = re.compile(r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRIREF><[^<>"{}|^`\\\s]*>)
  | (?P<VAR>[?$][A-Za-z_][A-Za-z_0-9]*)
  | (?P<BNODE>_:[A-Za-z_0-9]+)
  | (?P<PNAME>[A-Za-z_][A-Za-z_0-9.\-]*:[A-Za-z_0-9.\-%]*)
  | (?P<STRING>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<NUMBER>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<KW>[A-Za-z][A-Za-z_0-9]*)
  | (?P<OP>\^\^|&&|\|\||!=|<=|>=|[{}()\[\],;.=<>!+\-*/?^|])
""", re.VERBOSE)

#: keywords recognised case-insensitively (everything else alphabetic
#: in a term position is an error — SPARQL terms are IRIs/vars/literals)
_KEYWORDS = {
    "PREFIX", "BASE", "SELECT", "ASK", "CONSTRUCT", "DESCRIBE", "WHERE",
    "DISTINCT", "REDUCED", "FILTER", "OPTIONAL", "UNION", "MINUS",
    "BIND", "VALUES", "AS", "GROUP", "BY", "HAVING", "ORDER", "ASC",
    "DESC", "LIMIT", "OFFSET", "EXISTS", "NOT", "IN", "TRUE", "FALSE",
    "UNDEF", "A",
}


@dataclass
class _Tok:
    kind: str  # IRIREF VAR PNAME STRING LANGTAG NUMBER KW OP BNODE EOF
    text: str
    pos: int


def _lex(src: str) -> list[_Tok]:
    toks, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise SparqlSyntaxError(
                f"cannot tokenize at offset {i}: {src[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        text = m.group()
        if kind == "KW" and text.upper() not in _KEYWORDS:
            # bare word that is not a keyword: SPARQL has none outside
            # prefixed names — flag it where it is used
            pass
        toks.append(_Tok(kind, text, m.start()))
    toks.append(_Tok("EOF", "", len(src)))
    return toks


class SparqlSyntaxError(ValueError):
    pass


class SparqlUnsupportedError(ValueError):
    """Grammar the engine's execution algebra cannot express."""


# ----------------------------------------------------------------- AST
# Group elements are small tagged tuples:
#   ("triples", [pattern, ...])        kg/query pattern tuples
#   ("filter", sql_text)               translated expression
#   ("exists", negate, group)          FILTER [NOT] EXISTS
#   ("optional", group)
#   ("union", [group, ...])
#   ("minus", group)
#   ("bind", var, sql_text)
#   ("values", [ {var: text} ... ])
#   ("group", group)                   nested { … }
#   ("subselect", SelectQuery)
#   ("graphpat", term, group)          GRAPH ?g|<iri> { … }


@dataclass
class _Select:
    items: list  # [("var", name) | ("expr", sql, name) | ("agg", sql, name)]
    star: bool
    distinct: bool
    group: list  # group elements
    group_by: list[str]
    having: list[str]
    order_by: list[str]
    limit: int | None
    offset: int | None


def _invert_str_path(p: str) -> str:
    """Inverse of a string path form. ^ distributes over a top-level
    alternation — ^(a|b) == ^a|^b, NOT (^a)|b, which a naive prefix
    concat would produce; members that are whole units (plain, ^-,
    !(…)- or (…)-mod-affixed) take/strip the ^ prefix the engine's
    pattern compiler dispatches on."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(p):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "|" and depth == 0:
            parts.append(p[start:i])
            start = i + 1
    parts.append(p[start:])
    if len(parts) > 1:
        return "|".join(_invert_str_path(x) for x in parts)
    return p[1:] if p.startswith("^") else "^" + p


def _invert_path(p: tuple) -> tuple:
    """Reverse a tuple path form: ^(a/b) == ^b/^a and
    ^((a/b)+) == (^b/^a)+ — steps reverse and each inverts; string
    steps take the ^ prefix (the engine dispatches ^ on any path
    form, including affixed ones like ^a+ == (^a)+ reachability)."""
    def inv(step):
        if isinstance(step, tuple):
            return _invert_path(step)
        return _invert_str_path(step)
    return (p[0], *[inv(s) for s in reversed(p[1:])])


class _Parser:
    def __init__(self, src: str):
        self.toks = _lex(src)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        #: variables whose term metadata the translated expressions
        #: reference (LANG/DATATYPE/isIRI/…) — filled by _expr
        self.meta_vars: set[str] = set()
        #: FROM / FROM NAMED dataset clause (filled by the query forms)
        self.from_graphs: list[str] = []
        self.from_named: list[str] = []
        #: blank-node labels in patterns -> fresh variable names
        self._bnode_vars: dict[str, str] = {}
        self._anon_n = 0
        #: inside a CONSTRUCT template (bnodes mean fresh nodes there)
        self.in_template = False

    # -- token plumbing ----------------------------------------------
    def peek(self, ahead: int = 0) -> _Tok:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_kw(self, *words: str) -> bool:
        t = self.peek()
        return t.kind == "KW" and t.text.upper() in words

    def eat_kw(self, word: str) -> None:
        if not self.at_kw(word):
            raise SparqlSyntaxError(
                f"expected {word} at offset {self.peek().pos}, "
                f"got {self.peek().text!r}")
        self.next()

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t.kind == "OP" and t.text in ops

    def eat_op(self, op: str) -> None:
        if not self.at_op(op):
            raise SparqlSyntaxError(
                f"expected {op!r} at offset {self.peek().pos}, "
                f"got {self.peek().text!r}")
        self.next()

    # -- prologue ------------------------------------------------------
    def parse_prologue(self) -> None:
        while True:
            if self.at_kw("PREFIX"):
                self.next()
                pn = self.next()
                if pn.kind != "PNAME" or not pn.text.endswith(":"):
                    raise SparqlSyntaxError(
                        f"PREFIX needs 'pfx:' at offset {pn.pos}")
                iri = self.next()
                if iri.kind != "IRIREF":
                    raise SparqlSyntaxError(
                        f"PREFIX needs <iri> at offset {iri.pos}")
                self.prefixes[pn.text[:-1]] = iri.text[1:-1]
            elif self.at_kw("BASE"):
                self.next()
                iri = self.next()
                if iri.kind != "IRIREF":
                    raise SparqlSyntaxError(
                        f"BASE needs <iri> at offset {iri.pos}")
                self.base = iri.text[1:-1]
            else:
                return

    # -- terms ---------------------------------------------------------
    def parse_dataset_clause(self) -> tuple[list[str], list[str]]:
        """``(FROM <iri> | FROM NAMED <iri>)*`` -> (default-graph merge
        list, named-graph list)."""
        frm: list[str] = []
        named: list[str] = []
        while self.at_kw("FROM"):
            self.next()
            target = frm
            if self.at_kw("NAMED"):
                self.next()
                target = named
            t = self.next()
            if t.kind not in ("IRIREF", "PNAME"):
                raise SparqlSyntaxError(
                    f"FROM needs an IRI at offset {t.pos}, got {t.text!r}")
            target.append(self._iri_text(t))
        return frm, named

    def _iri_text(self, tok: _Tok) -> str:
        if tok.kind == "IRIREF":
            body = tok.text[1:-1]
            if self.base and "://" not in body and not body.startswith(
                    ("urn:", "mailto:", "file:")):
                return self.base + body
            return body
        if tok.kind == "PNAME":
            pfx, _, local = tok.text.partition(":")
            if pfx in self.prefixes:
                return self.prefixes[pfx] + local
            return tok.text  # compact-term table (module docstring)
        raise SparqlSyntaxError(f"expected IRI at offset {tok.pos}")

    def parse_term(self, position: str):
        """One RDF term in a triple pattern -> engine text.

        Returns (text, is_literal, datatype, lang) — metadata is used by
        CONSTRUCT templates; pattern matching uses only the text."""
        t = self.peek()
        if t.kind == "VAR":
            self.next()
            return ("?" + t.text[1:], False, None, None)
        if t.kind in ("IRIREF", "PNAME"):
            self.next()
            return (self._iri_text(t), False, None, None)
        if t.kind == "KW" and t.text.upper() == "A" and position == "pred":
            self.next()
            return ("rdf:type" if "rdf" not in self.prefixes
                    else self.prefixes["rdf"] + "type",
                    False, None, None)
        if t.kind == "STRING":
            self.next()
            text = _unquote(t.text)
            lang = dt = None
            if self.peek().kind == "LANGTAG":
                lang = self.next().text[1:]
            elif self.at_op("^^"):
                self.next()
                dt = self._iri_text(self.next())
            return (text, True, dt, lang)
        if t.kind == "NUMBER":
            self.next()
            dt = ("xsd:integer" if re.fullmatch(r"[+-]?\d+", t.text)
                  else "xsd:decimal")
            return (t.text, True, dt, None)
        if t.kind == "KW" and t.text.upper() in ("TRUE", "FALSE"):
            self.next()
            return (t.text.lower(), True, "xsd:boolean", None)
        if t.kind == "BNODE":
            if self.in_template:
                raise SparqlUnsupportedError(
                    "blank nodes in CONSTRUCT templates (fresh node per "
                    "solution) are not supported; use a BIND'd IRI")
            # SPARQL §4.1.4: a blank-node label in a query pattern is a
            # non-projectable variable scoped to the query — same label,
            # same variable. The __-prefixed name keeps it out of
            # SELECT * projections.
            self.next()
            name = self._bnode_vars.setdefault(
                t.text[2:], f"__bn{len(self._bnode_vars)}")
            return ("?" + name, False, None, None)
        if (t.kind == "OP" and t.text == "["
                and self.peek(1).text == "]" and not self.in_template):
            # anonymous blank node []: a fresh variable per occurrence
            self.next()
            self.next()
            self._anon_n += 1
            return (f"?__bn_anon{self._anon_n}", False, None, None)
        if t.kind == "OP" and t.text in ("[", "("):
            raise SparqlUnsupportedError(
                "[ … ] property lists and ( … ) collections are only "
                "supported inside WHERE triple blocks; name the node "
                "explicitly here")
        raise SparqlSyntaxError(
            f"expected RDF term at offset {t.pos}, got {t.text!r}")

    # -- property paths -------------------------------------------------
    def parse_path(self):
        """Path -> engine form: str (possibly with ^/!/|/+/*/? affixes)
        or ("/", step, …) tuple, or "?var"."""
        t = self.peek()
        if t.kind == "VAR":
            self.next()
            return "?" + t.text[1:]
        alts = [self._path_sequence()]
        while self.at_op("|"):
            self.next()
            alts.append(self._path_sequence())
        if len(alts) == 1:
            return alts[0]
        if any(isinstance(a, tuple) for a in alts):
            raise SparqlUnsupportedError(
                "alternation over sequence paths ((p/q)|r) is not "
                "supported; split into a UNION of patterns")
        return "|".join(alts)

    def _path_sequence(self):
        steps = [self._path_elt()]
        while self.at_op("/"):
            self.next()
            steps.append(self._path_elt())
        if len(steps) == 1:
            return steps[0]
        if any(isinstance(s, tuple) for s in steps):
            # nested sequence tuples flatten (a/(b/c) == a/b/c);
            # closure tuples (mod, …) stay intact as single steps
            flat = []
            for s in steps:
                flat.extend(s[1:] if isinstance(s, tuple) and s[0] == "/"
                            else [s])
            return ("/", *flat)
        return ("/", *steps)

    def _path_elt(self):
        inverse = False
        if self.at_op("^"):
            self.next()
            inverse = True
        prim = self._path_primary()
        if self.at_op("+", "*", "?"):
            mod = self.next().text
            if isinstance(prim, tuple):
                # closure over a sequence group — (p/q)+ — engine tuple
                # form (mod, step, …): the composed edge set is closed
                # (kg/query._compile_path_pattern)
                prim = (mod, *prim[1:])
            elif "|" in prim:
                # closure over an alternation — (p|^q)+ — closes the
                # UNION of the member edge sets (kg/query.py
                # _compile_path_pattern); members must be plain or
                # inverse IRIs (no nested modifiers / negated sets)
                members = prim.split("|")
                if any(m.startswith("!") or m.endswith(("+", "*", "?"))
                       or "(" in m for m in members):
                    raise SparqlUnsupportedError(
                        f"path modifier {mod!r} over an alternation "
                        "supports plain or inverse IRI members only")
                prim = "(" + prim + ")" + mod
            else:
                prim = prim + mod
        if inverse:
            if isinstance(prim, tuple):
                # ^(a/b) == ^b/^a; ^((a/b)+) == (^b/^a)+ — recursion
                # handles nested groups; string steps invert with the
                # ^ prefix the engine already dispatches on
                return _invert_path(prim)
            return _invert_str_path(prim)
        return prim

    def _path_primary(self):
        t = self.peek()
        if t.kind in ("IRIREF", "PNAME"):
            self.next()
            return self._iri_text(t)
        if t.kind == "KW" and t.text.upper() == "A":
            self.next()
            return ("rdf:type" if "rdf" not in self.prefixes
                    else self.prefixes["rdf"] + "type")
        if self.at_op("!"):
            self.next()
            banned = []
            if self.at_op("("):
                self.next()
                while True:
                    inv = self.at_op("^")
                    if inv:
                        self.next()
                    m = self._path_primary()
                    banned.append(("^" if inv else "") + str(m)
                                  if not isinstance(m, tuple) else m)
                    if self.at_op("|"):
                        self.next()
                        continue
                    break
                self.eat_op(")")
            else:
                banned = [self._path_primary()]
            if any(isinstance(b, tuple) or str(b).startswith("!")
                   for b in banned):
                raise SparqlUnsupportedError(
                    "negated property set members must be IRIs or ^IRIs")
            fwd = [b for b in banned if not b.startswith("^")]
            inv = [b[1:] for b in banned if b.startswith("^")]
            if not inv:
                return "!(" + "|".join(fwd) + ")"
            # §9.1 mixed sets: forward edges with pred outside the
            # forward members UNION reversed edges with pred outside
            # the inverse members — two scans the engine already has
            inv_part = "^!(" + "|".join(inv) + ")"
            if not fwd:
                return inv_part
            return "!(" + "|".join(fwd) + ")|" + inv_part
        if self.at_op("("):
            self.next()
            inner = self.parse_path()
            self.eat_op(")")
            return inner
        raise SparqlSyntaxError(
            f"expected property path at offset {t.pos}, got {t.text!r}")

    # -- group graph pattern ---------------------------------------------
    def parse_group(self) -> list:
        """``{ … }`` -> list of tagged elements (module AST comment)."""
        self.eat_op("{")
        elems: list = []
        while not self.at_op("}"):
            if self.at_kw("FILTER"):
                self.next()
                if self.at_kw("EXISTS"):
                    self.next()
                    elems.append(("exists", False, self.parse_group()))
                elif self.at_kw("NOT"):
                    self.next()
                    self.eat_kw("EXISTS")
                    elems.append(("exists", True, self.parse_group()))
                else:
                    elems.append(("filter", self._bracketed_expr()))
            elif self.at_kw("OPTIONAL"):
                self.next()
                elems.append(("optional", self.parse_group()))
            elif self.at_kw("MINUS"):
                self.next()
                elems.append(("minus", self.parse_group()))
            elif self.at_kw("GRAPH"):
                self.next()
                t = self.peek()
                if t.kind == "VAR":
                    self.next()
                    term = "?" + t.text[1:]
                elif t.kind in ("IRIREF", "PNAME"):
                    self.next()
                    term = self._iri_text(t)
                else:
                    raise SparqlSyntaxError(
                        f"GRAPH needs ?var or IRI at offset {t.pos}, "
                        f"got {t.text!r}")
                elems.append(("graphpat", term, self.parse_group()))
            elif self.at_kw("BIND"):
                self.next()
                self.eat_op("(")
                sql = self._expr()
                self.eat_kw("AS")
                v = self.next()
                if v.kind != "VAR":
                    raise SparqlSyntaxError(
                        f"BIND needs ?var at offset {v.pos}")
                self.eat_op(")")
                elems.append(("bind", v.text[1:], sql))
            elif self.at_kw("VALUES"):
                self.next()
                elems.append(("values", self._values_rows()))
            elif self.at_op("{"):
                # nested group, UNION chain, or sub-SELECT
                if (self.peek(1).kind == "KW"
                        and self.peek(1).text.upper() == "SELECT"):
                    self.next()
                    sub = self.parse_select(sub=True)
                    self.eat_op("}")
                    elems.append(("subselect", sub))
                else:
                    first = self.parse_group()
                    if self.at_kw("UNION"):
                        branches = [first]
                        while self.at_kw("UNION"):
                            self.next()
                            branches.append(self.parse_group())
                        elems.append(("union", branches))
                    else:
                        elems.append(("group", first))
            else:
                elems.append(("triples", self._triples_block()))
            if self.at_op("."):
                self.next()
        self.eat_op("}")
        return elems

    def _bnpl(self, pats: list[tuple]) -> str:
        """Blank-node property list ``[ p o ; q z ]`` -> a fresh
        non-projectable variable, with the bracketed predicate-object
        pairs desugared into ordinary patterns on it (SPARQL §4.1.4);
        nests recursively in either position."""
        self.eat_op("[")
        self._anon_n += 1
        node = f"?__bn_anon{self._anon_n}"
        while not self.at_op("]"):
            p = self.parse_path()
            while True:
                o = self._term_or_bnpl("obj", pats)
                pats.append((node, p, o))
                if self.at_op(","):
                    self.next()
                    continue
                break
            if self.at_op(";"):
                self.next()
                continue
            break
        self.eat_op("]")
        return node

    def _rdf(self, local: str) -> str:
        """rdf: vocabulary term, honoring a declared rdf prefix (same
        convention as ``a`` -> rdf:type in parse_term)."""
        return (self.prefixes["rdf"] + local if "rdf" in self.prefixes
                else "rdf:" + local)

    def _collection(self, pats: list[tuple]) -> str:
        """RDF collection ``( e1 e2 … )`` in term position -> the spine
        patterns head rdf:first e1 / head rdf:rest tail / … / rdf:nil
        on fresh non-projectable variables (SPARQL §4.2); ``()`` is the
        plain term rdf:nil."""
        self.eat_op("(")
        if self.at_op(")"):
            self.next()
            return self._rdf("nil")
        elems = []
        while not self.at_op(")"):
            elems.append(self._term_or_bnpl("obj", pats))
        self.eat_op(")")
        nodes = []
        for _ in elems:
            self._anon_n += 1
            nodes.append(f"?__bn_anon{self._anon_n}")
        for node, elem, nxt in zip(nodes, elems,
                                   nodes[1:] + [self._rdf("nil")]):
            pats.append((node, self._rdf("first"), elem))
            pats.append((node, self._rdf("rest"), nxt))
        return nodes[0]

    def _term_or_bnpl(self, position: str, pats: list[tuple]) -> str:
        if (self.peek().kind == "OP" and self.peek().text == "["
                and self.peek(1).text != "]"):
            return self._bnpl(pats)
        if self.peek().kind == "OP" and self.peek().text == "(":
            return self._collection(pats)
        text, lit, _, _ = self.parse_term(position)
        if lit and position == "subj":
            raise SparqlSyntaxError("literal in subject position")
        return text

    def _triples_block(self) -> list[tuple]:
        """subject predicateObjectList with ``;`` and ``,``."""
        pats: list[tuple] = []
        while True:
            was_sugar = (self.peek().kind == "OP"
                         and ((self.peek().text == "["
                               and self.peek(1).text != "]")
                              or (self.peek().text == "("
                                  and self.peek(1).text != ")")))
            s = self._term_or_bnpl("subj", pats)
            # a standalone "[ p o ] ." / "( e1 e2 ) ." statement has no
            # further predicateObjectList after the bracket closes
            if not (was_sugar and self.at_op(".", "}")):
                while True:
                    p = self.parse_path()
                    while True:
                        o = self._term_or_bnpl("obj", pats)
                        pats.append((s, p, o))
                        if self.at_op(","):
                            self.next()
                            continue
                        break
                    if self.at_op(";"):
                        self.next()
                        if self.at_op(".", ";", "}"):  # trailing ;
                            break
                        continue
                    break
            if self.at_op("."):
                # consume and continue only if another triple follows
                nxt = self.peek(1)
                if (nxt.kind in ("VAR", "IRIREF", "PNAME", "STRING",
                                 "NUMBER")
                        or (nxt.kind == "OP" and nxt.text in ("[", "("))):
                    self.next()
                    continue
            break
        return pats

    def _values_rows(self) -> list[dict]:
        single = None
        if self.peek().kind == "VAR":
            single = self.next().text[1:]
            cols = [single]
        else:
            self.eat_op("(")
            cols = []
            while self.peek().kind == "VAR":
                cols.append(self.next().text[1:])
            self.eat_op(")")
        self.eat_op("{")
        rows: list[dict] = []
        while not self.at_op("}"):
            if single is not None:
                if self.at_kw("UNDEF"):
                    self.next()  # wildcard row: binds nothing
                    rows.append({})
                else:
                    text, _, _, _ = self.parse_term("obj")
                    rows.append({single: text})
            else:
                self.eat_op("(")
                row = {}
                for c in cols:
                    if self.at_kw("UNDEF"):
                        self.next()  # this row leaves c unconstrained
                        continue
                    text, _, _, _ = self.parse_term("obj")
                    row[c] = text
                self.eat_op(")")
                rows.append(row)
        self.eat_op("}")
        return rows

    # -- expressions -> Spark SQL -----------------------------------------
    def _bracketed_expr(self) -> str:
        self.eat_op("(")
        sql = self._expr()
        self.eat_op(")")
        return sql

    def _expr(self) -> str:
        return self._or_expr()

    def _or_expr(self) -> str:
        left = self._and_expr()
        while self.at_op("||"):
            self.next()
            left = f"({left} OR {self._and_expr()})"
        return left

    def _and_expr(self) -> str:
        left = self._rel_expr()
        while self.at_op("&&"):
            self.next()
            left = f"({left} AND {self._rel_expr()})"
        return left

    def _rel_expr(self) -> str:
        left = self._add_expr()
        if self.at_op("=", "!=", "<", ">", "<=", ">="):
            op = self.next().text
            right = self._add_expr()
            return f"({left} {op} {right})"
        if self.at_kw("IN"):
            self.next()
            return f"({left} IN {self._expr_list_sql()})"
        if self.at_kw("NOT"):
            self.next()
            self.eat_kw("IN")
            return f"({left} NOT IN {self._expr_list_sql()})"
        return left

    def _expr_list_sql(self) -> str:
        self.eat_op("(")
        items = [self._expr()]
        while self.at_op(","):
            self.next()
            items.append(self._expr())
        self.eat_op(")")
        return "(" + ", ".join(items) + ")"

    def _add_expr(self) -> str:
        left = self._mul_expr()
        while self.at_op("+", "-"):
            op = self.next().text
            left = f"({_num(left)} {op} {_num(self._mul_expr())})"
        return left

    def _mul_expr(self) -> str:
        left = self._unary_expr()
        while self.at_op("*", "/"):
            op = self.next().text
            left = f"({_num(left)} {op} {_num(self._unary_expr())})"
        return left

    def _unary_expr(self) -> str:
        if self.at_op("!"):
            self.next()
            return f"(NOT {self._unary_expr()})"
        if self.at_op("-"):
            self.next()
            return f"(- {_num(self._unary_expr())})"
        if self.at_op("+"):
            self.next()
            return self._unary_expr()
        return self._primary_expr()

    def _primary_expr(self) -> str:
        t = self.peek()
        if t.kind == "OP" and t.text == "(":
            return self._bracketed_expr()
        if t.kind == "VAR":
            self.next()
            return t.text[1:]
        if t.kind == "NUMBER":
            self.next()
            return t.text
        if t.kind == "STRING":
            self.next()
            text = _unquote(t.text)
            if self.peek().kind == "LANGTAG":
                self.next()  # tag compared via LANG(); lexical form here
            elif self.at_op("^^"):
                self.next()
                dt = self._iri_text(self.next())
                return _typed_literal_sql(text, dt)
            return _sql_str(text)
        if t.kind == "IRIREF" or t.kind == "PNAME":
            # IRI used as a value (e.g. ?x = <iri>): compare by text —
            # but a PNAME followed by "(" would be a cast we don't do
            self.next()
            return _sql_str(self._iri_text(t))
        if t.kind == "KW":
            if t.text.upper() in self._AGGS:
                return self._agg_call()  # aggregates inside HAVING etc.
            return self._call_expr()
        raise SparqlSyntaxError(
            f"expected expression at offset {t.pos}, got {t.text!r}")

    def _call_expr(self) -> str:
        name = self.next().text.upper()
        if name in ("TRUE", "FALSE"):
            return name.lower()

        def args(minn, maxn) -> list[str]:
            self.eat_op("(")
            out = []
            if not self.at_op(")"):
                out.append(self._expr())
                while self.at_op(","):
                    self.next()
                    out.append(self._expr())
            self.eat_op(")")
            if not (minn <= len(out) <= maxn):
                raise SparqlSyntaxError(
                    f"{name} takes {minn}..{maxn} args, got {len(out)}")
            return out

        def meta(var_sql: str, suffix: str) -> str:
            if not re.fullmatch(r"[A-Za-z_][A-Za-z_0-9]*", var_sql):
                raise SparqlUnsupportedError(
                    f"{name} applies to a variable, got {var_sql!r}")
            self.meta_vars.add(var_sql)
            return f"{var_sql}__{suffix}"

        if name == "BOUND":
            (a,) = args(1, 1)
            return f"({a} IS NOT NULL)"
        if name == "REGEX":
            a = args(2, 3)
            pat = a[1]
            if len(a) == 3:
                flags = a[2].strip("'")
                if flags == "i":
                    pat = (f"'(?i)' || {a[1]}" if not _is_sql_str(a[1])
                           else _sql_str("(?i)" + a[1][1:-1]))
                elif flags:
                    raise SparqlUnsupportedError(
                        f"REGEX flags {flags!r} not supported (only 'i')")
            return f"({a[0]} RLIKE {pat})"
        if name == "STR":
            (a,) = args(1, 1)
            return f"CAST({a} AS STRING)"
        if name == "LANG":
            (a,) = args(1, 1)
            return f"coalesce({meta(a, 'lang')}, '')"
        if name == "DATATYPE":
            (a,) = args(1, 1)
            return meta(a, "datatype")
        if name == "LANGMATCHES":
            a, b = args(2, 2)
            if _is_sql_str(b) and b[1:-1] == "*":
                return f"({a} <> '')"
            return (f"(lower({a}) = lower({b}) OR "
                    f"startswith(lower({a}), lower({b}) || '-'))")
        if name in ("ISIRI", "ISURI"):
            (a,) = args(1, 1)
            return (f"({meta(a, 'isiri')} AND NOT "
                    f"startswith({a}, '_:'))")
        if name == "ISLITERAL":
            (a,) = args(1, 1)
            return f"(NOT {meta(a, 'isiri')})"
        if name == "ISBLANK":
            (a,) = args(1, 1)
            return f"({meta(a, 'isiri')} AND startswith({a}, '_:'))"
        if name == "SAMETERM":
            a, b = args(2, 2)
            return f"({a} = {b})"
        if name == "ISNUMERIC":
            # numeric literal test: datatype in the XSD numeric
            # hierarchy, matched in both the compact and full-IRI
            # spellings the term sources use
            (a,) = args(1, 1)
            kinds = ("integer", "decimal", "float", "double", "int",
                     "long", "short", "byte", "nonNegativeInteger",
                     "positiveInteger", "nonPositiveInteger",
                     "negativeInteger", "unsignedInt", "unsignedLong",
                     "unsignedShort", "unsignedByte")
            alts = ", ".join(
                [f"'xsd:{k}'" for k in kinds]
                + [f"'http://www.w3.org/2001/XMLSchema#{k}'"
                   for k in kinds])
            return (f"(NOT {meta(a, 'isiri')} AND "
                    f"{meta(a, 'datatype')} IN ({alts}))")
        if name == "STRSTARTS":
            a, b = args(2, 2)
            return f"startswith({a}, {b})"
        if name == "STRENDS":
            a, b = args(2, 2)
            return f"endswith({a}, {b})"
        if name == "CONTAINS":
            a, b = args(2, 2)
            return f"contains({a}, {b})"
        if name == "STRLEN":
            (a,) = args(1, 1)
            return f"length({a})"
        if name == "STRBEFORE":
            a, b = args(2, 2)
            return (f"(CASE WHEN instr({a}, {b}) > 0 THEN "
                    f"substring({a}, 1, instr({a}, {b}) - 1) "
                    f"ELSE '' END)")
        if name == "STRAFTER":
            a, b = args(2, 2)
            return (f"(CASE WHEN instr({a}, {b}) > 0 THEN "
                    f"substring({a}, instr({a}, {b}) + length({b})) "
                    f"ELSE '' END)")
        if name == "UCASE":
            (a,) = args(1, 1)
            return f"upper({a})"
        if name == "LCASE":
            (a,) = args(1, 1)
            return f"lower({a})"
        if name == "SUBSTR":
            a = args(2, 3)
            return f"substring({', '.join(a)})"
        if name == "CONCAT":
            a = args(1, 99)
            return f"concat({', '.join(a)})"
        if name == "REPLACE":
            a = args(3, 3)
            return f"regexp_replace({a[0]}, {a[1]}, {a[2]})"
        if name in ("ABS", "CEIL", "FLOOR", "ROUND"):
            (a,) = args(1, 1)
            return f"{name.lower()}({a})"
        if name == "IF":
            a = args(3, 3)
            return f"if({a[0]}, {a[1]}, {a[2]})"
        if name == "COALESCE":
            a = args(1, 99)
            return f"coalesce({', '.join(a)})"
        if name in ("IRI", "URI"):
            # IRI minting for CONSTRUCT-style workflows: the engine's
            # term model carries kind metadata only for pattern-bound
            # variables, and template instantiation defaults a BIND'd
            # object to the IRI kind — so the value IS the term here
            (a,) = args(1, 1)
            if self.base:
                return (f"(CASE WHEN {a} LIKE '%://%' THEN {a} "
                        f"ELSE {_sql_str(self.base)} || {a} END)")
            return f"CAST({a} AS STRING)"
        if name in ("STRDT", "STRLANG"):
            # lexical form only, per the module's literal divergence
            # note — BIND'd variables carry no term metadata
            a, _ = args(2, 2)
            return f"CAST({a} AS STRING)"
        if name == "ENCODE_FOR_URI":
            # RFC 3986 unreserved set: url_encode is form-encoding, so
            # fix the three divergences (space, '*', '~')
            (a,) = args(1, 1)
            return (f"replace(replace(replace(url_encode({a}), "
                    f"'+', '%20'), '*', '%2A'), '%7E', '~')")
        if name in ("YEAR", "MONTH", "DAY", "HOURS", "MINUTES"):
            # XPath accessors over the xsd:dateTime LEXICAL form (the
            # term model stores lexical text; the spec reads components
            # from the literal's own timezone, which IS the lexical
            # form — no UTC normalization, no session-timezone cast)
            (a,) = args(1, 1)
            pat = {
                "YEAR": r"^(-?\\d{4,})-",
                "MONTH": r"^-?\\d{4,}-(\\d{2})",
                "DAY": r"^-?\\d{4,}-\\d{2}-(\\d{2})",
                "HOURS": r"T(\\d{2})",
                "MINUTES": r"T\\d{2}:(\\d{2})",
            }[name]
            return (f"CAST(nullif(regexp_extract({a}, '{pat}', 1), "
                    f"'') AS INT)")
        if name == "SECONDS":
            # xsd:decimal per spec — DOUBLE here (the engine's numeric
            # carrier for non-integer builtins)
            (a,) = args(1, 1)
            return (f"CAST(nullif(regexp_extract({a}, "
                    f"'T\\\\d{{2}}:\\\\d{{2}}:(\\\\d{{2}}(?:\\\\.\\\\d+)?)'"
                    f", 1), '') AS DOUBLE)")
        if name == "TZ":
            # simple literal: 'Z', '+05:30', … or '' when absent
            (a,) = args(1, 1)
            return f"regexp_extract({a}, '(Z|[+-]\\\\d{{2}}:\\\\d{{2}})$', 1)"
        if name == "TIMEZONE":
            # xsd:dayTimeDuration lexical form ('PT0S', '-PT5H',
            # 'PT5H30M'); NULL (type error) when the literal has none
            (a,) = args(1, 1)
            tz = f"regexp_extract({a}, '(Z|[+-]\\\\d{{2}}:\\\\d{{2}})$', 1)"
            hh = f"CAST(substring({tz}, 2, 2) AS INT)"
            mm = f"CAST(substring({tz}, 5, 2) AS INT)"
            return (
                f"(CASE WHEN {tz} = 'Z' THEN 'PT0S' "
                f"WHEN {tz} = '' THEN NULL "
                f"WHEN {hh} = 0 AND {mm} = 0 THEN 'PT0S' "
                f"ELSE concat("
                f"CASE WHEN substring({tz}, 1, 1) = '-' THEN '-' "
                f"ELSE '' END, 'PT', "
                f"CASE WHEN {hh} > 0 THEN concat(CAST({hh} AS STRING), "
                f"'H') ELSE '' END, "
                f"CASE WHEN {mm} > 0 THEN concat(CAST({mm} AS STRING), "
                f"'M') ELSE '' END) END)")
        if name in ("NOW", "RAND", "UUID", "STRUUID", "BNODE"):
            raise SparqlUnsupportedError(
                f"builtin {name} is nondeterministic — a distributed "
                "engine re-evaluates expressions per partition/retry, "
                "so its results could differ within one query; bind "
                "the value outside the query instead")
        if name == "MD5":
            (a,) = args(1, 1)
            return f"md5({a})"
        if name == "SHA1":
            (a,) = args(1, 1)
            return f"sha1({a})"
        if name in ("SHA256", "SHA384", "SHA512"):
            (a,) = args(1, 1)
            return f"sha2({a}, {name[3:]})"
        raise SparqlUnsupportedError(f"builtin {name} not supported")

    # -- SELECT ------------------------------------------------------------
    def parse_select(self, sub: bool = False) -> _Select:
        self.eat_kw("SELECT")
        distinct = False
        if self.at_kw("DISTINCT"):
            self.next()
            distinct = True
        elif self.at_kw("REDUCED"):
            self.next()
            distinct = True  # documented: REDUCED treated as DISTINCT
        items, star = [], False
        if self.at_op("*"):
            self.next()
            star = True
        else:
            while True:
                if self.peek().kind == "VAR":
                    items.append(("var", self.next().text[1:]))
                elif self.at_op("("):
                    self.next()
                    kind, sql = self._select_expr()
                    self.eat_kw("AS")
                    v = self.next()
                    if v.kind != "VAR":
                        raise SparqlSyntaxError(
                            f"(expr AS ?var) at offset {v.pos}")
                    self.eat_op(")")
                    items.append((kind, sql, v.text[1:]))
                else:
                    break
            if not items:
                raise SparqlSyntaxError("empty SELECT clause")
        frm, named = self.parse_dataset_clause()
        if sub and (frm or named):
            raise SparqlSyntaxError(
                "FROM / FROM NAMED are not allowed in a sub-SELECT")
        self.from_graphs, self.from_named = frm, named
        if self.at_kw("WHERE"):
            self.next()
        group = self.parse_group()
        group_by: list[str] = []
        having: list[str] = []
        order_by: list[str] = []
        limit = offset = None
        while True:
            if self.at_kw("GROUP"):
                self.next()
                self.eat_kw("BY")
                while self.peek().kind == "VAR":
                    group_by.append(self.next().text[1:])
                if not group_by:
                    raise SparqlSyntaxError("GROUP BY needs ?vars")
            elif self.at_kw("HAVING"):
                self.next()
                having.append(self._agg_or_expr())
            elif self.at_kw("ORDER"):
                self.next()
                self.eat_kw("BY")
                while True:
                    if self.at_kw("ASC") or self.at_kw("DESC"):
                        d = self.next().text.upper()
                        e = self._bracketed_expr()
                        order_by.append(f"{e} {d}")
                    elif self.peek().kind == "VAR":
                        order_by.append(self.next().text[1:])
                    elif self.at_op("("):
                        order_by.append(self._bracketed_expr())
                    else:
                        break
                if not order_by:
                    raise SparqlSyntaxError("ORDER BY needs sort keys")
            elif self.at_kw("LIMIT"):
                self.next()
                limit = int(self.next().text)
            elif self.at_kw("OFFSET"):
                self.next()
                offset = int(self.next().text)
            else:
                break
        if not sub and self.at_kw("VALUES"):
            # §18.2.4.6 trailing VALUES: the data block joins INTO the
            # query pattern (before projection and modifiers), same
            # element form as an in-group VALUES
            self.next()
            group = group + [("values", self._values_rows())]
        return _Select(items, star, distinct, group, group_by, having,
                       order_by, limit, offset)

    def parse_order_limit_offset(self):
        """``ORDER BY … LIMIT n OFFSET n`` (any order) — the solution
        modifiers legal on CONSTRUCT/DESCRIBE query forms."""
        order_by: list[str] = []
        limit = offset = None
        while True:
            if self.at_kw("ORDER"):
                self.next()
                self.eat_kw("BY")
                while True:
                    if self.at_kw("ASC") or self.at_kw("DESC"):
                        d = self.next().text.upper()
                        order_by.append(f"{self._bracketed_expr()} {d}")
                    elif self.peek().kind == "VAR":
                        order_by.append(self.next().text[1:])
                    elif self.at_op("("):
                        order_by.append(self._bracketed_expr())
                    else:
                        break
                if not order_by:
                    raise SparqlSyntaxError("ORDER BY needs sort keys")
            elif self.at_kw("LIMIT"):
                self.next()
                limit = int(self.next().text)
            elif self.at_kw("OFFSET"):
                self.next()
                offset = int(self.next().text)
            else:
                break
        return order_by, limit, offset

    _AGGS = {"COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE",
             "GROUP_CONCAT"}

    def _select_expr(self):
        """Inside (… AS ?v): aggregate call or plain expression."""
        t = self.peek()
        if t.kind == "KW" and t.text.upper() in self._AGGS:
            return ("agg", self._agg_call())
        return ("expr", self._expr())

    def _agg_or_expr(self) -> str:
        t = self.peek()
        if t.kind == "KW" and t.text.upper() in self._AGGS:
            return self._agg_call()
        return self._expr()

    def _agg_call(self) -> str:
        name = self.next().text.upper()
        self.eat_op("(")
        distinct = False
        if self.at_kw("DISTINCT"):
            self.next()
            distinct = True
        if name == "COUNT" and self.at_op("*"):
            self.next()
            self.eat_op(")")
            if not distinct:
                return "count(1)"
            # COUNT(DISTINCT *) counts DISTINCT SOLUTIONS — the column
            # set isn't known at parse time, so emit a sentinel that
            # _run_select expands to count(distinct struct(<in-scope
            # vars>)) against the actual solution table (r5; the old
            # count(distinct 1) was simply wrong — always 1)
            return _COUNT_DISTINCT_STAR
        inner = self._expr()
        if name == "GROUP_CONCAT":
            sep = " "
            if self.at_op(";"):
                self.next()
                kw = self.next()
                if kw.text.upper() != "SEPARATOR":
                    raise SparqlSyntaxError(
                        f"expected SEPARATOR at offset {kw.pos}")
                if self.at_op("="):
                    self.next()
                s = self.next()
                if s.kind != "STRING":
                    raise SparqlSyntaxError("SEPARATOR needs a string")
                sep = _unquote(s.text)
            self.eat_op(")")
            coll = ("collect_set" if distinct else "collect_list")
            # sorted for determinism (module docstring divergence)
            return (f"array_join(sort_array({coll}({inner})), "
                    f"{_sql_str(sep)})")
        self.eat_op(")")
        d = "distinct " if distinct else ""
        if name == "SAMPLE":
            return f"min({inner})"  # deterministic sample (docstring)
        return f"{name.lower()}({d}{inner})"


#: parse-time sentinel for COUNT(DISTINCT *) — expanded against the
#: solution table's in-scope columns in _run_select
_COUNT_DISTINCT_STAR = "__COUNT_DISTINCT_STAR__()"


def _num(sql: str) -> str:
    """Numeric coercion for arithmetic operands (r5 — VERDICT r4 #7:
    ``SUM(?x * ?y)``-style expression aggregates): term values are
    stored as lexical strings, so ``?x * ?y`` compiles to a string
    multiply that Spark rejects. SPARQL arithmetic is defined on the
    numeric VALUE space; with lexical storage every operand promotes
    to double (an engine keeping typed columns would dispatch on
    ``obj_datatype`` — xsd numeric types all promote into double's
    value space, so results agree up to float formatting, which the
    contract queries canonicalize by rounding). Numeric literals pass
    through untouched."""
    if re.fullmatch(r"-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?", sql):
        return sql
    return f"CAST({sql} AS DOUBLE)"


def _unquote(s: str) -> str:
    body = s[1:-1]
    return (body.replace("\\\\", "\0").replace("\\\"", "\"")
            .replace("\\'", "'").replace("\\n", "\n").replace("\\t", "\t")
            .replace("\\r", "\r").replace("\0", "\\"))


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _is_sql_str(sql: str) -> bool:
    return sql.startswith("'") and sql.endswith("'")


_NUMERIC_DT = {
    "integer": "BIGINT", "int": "INT", "long": "BIGINT",
    "short": "SMALLINT", "byte": "TINYINT", "decimal": "DECIMAL(38,9)",
    "double": "DOUBLE", "float": "FLOAT", "boolean": "BOOLEAN",
    "nonNegativeInteger": "BIGINT", "positiveInteger": "BIGINT",
    "negativeInteger": "BIGINT", "nonPositiveInteger": "BIGINT",
    "unsignedLong": "BIGINT", "unsignedInt": "BIGINT",
    "date": "DATE", "dateTime": "TIMESTAMP",
}


def _typed_literal_sql(text: str, dt: str) -> str:
    local = dt.rsplit("#", 1)[-1].rsplit(":", 1)[-1].rsplit("/", 1)[-1]
    sql_t = _NUMERIC_DT.get(local)
    if sql_t is None:
        return _sql_str(text)
    return f"CAST({_sql_str(text)} AS {sql_t})"


# ------------------------------------------------------------ evaluator

class _Evaluator:
    """Execute a parsed group element list against the triple table.

    Solution sets are DataFrames with one column per variable; elements
    combine by the SPARQL join-on-shared-variables rule, which is
    exactly a column-name equi-join (the same machinery as
    kg/query._match_patterns, generalized to non-pattern operands)."""

    def __init__(self, triples: DataFrame, meta_vars: set[str],
                 reorder: bool, allow_cartesian: bool,
                 path_max_hops: int, graph_var: str | None = None):
        # a `graph` column switches on SPARQL dataset semantics: bare
        # patterns match the DEFAULT graph (graph IS NULL) only; GRAPH
        # clauses range over the named graphs (kg/dataset.py model)
        if "graph" in triples.columns:
            self.quads = triples
            self.triples = triples.filter(
                F.col("graph").isNull()).drop("graph")
        else:
            self.quads = None
            self.triples = triples
        self.graph_var = graph_var  # inside GRAPH ?g: blocks bind ?g
        self.pending_meta = set(meta_vars)
        self.reorder = reorder
        self.allow_cartesian = allow_cartesian
        self.hops = path_max_hops

    def _child(self, table: DataFrame, graph_var: str | None = None):
        """Evaluator over a re-scoped pattern table, sharing the
        pending-metadata state (a set object, mutated as blocks bind)."""
        ev = _Evaluator(table, set(), self.reorder, self.allow_cartesian,
                        self.hops, graph_var)
        ev.pending_meta = self.pending_meta
        if self.quads is not None and "graph" not in table.columns:
            ev.quads = self.quads  # nested GRAPH re-scopes to the dataset
        return ev

    # join a new solution set into the accumulator
    def _combine(self, acc, nxt: DataFrame, how: str = "inner"):
        if acc is None:
            if how != "inner":
                raise SparqlSyntaxError(
                    f"{how} element cannot start a group")
            return nxt
        shared = [c for c in nxt.columns if c in acc.columns]
        if shared:
            return acc.join(nxt, shared, how)
        if how == "left":
            raise SparqlSyntaxError(
                "OPTIONAL group shares no variable with the "
                "preceding patterns")
        if self.allow_cartesian:
            return acc.crossJoin(nxt)
        raise SparqlSyntaxError(
            "pattern group shares no variable with the preceding "
            "patterns (pass allow_cartesian=True to force)")

    def _block(self, pats: list[tuple]) -> DataFrame:
        """One triple block -> match_bgp with term-metadata binding for
        the still-pending metadata variables this block can bind.
        Inside ``GRAPH ?g`` the block compiles to quad patterns binding
        the graph variable (kg/dataset.match_quads) instead."""
        if self.graph_var is not None:
            from . import dataset
            for pat in pats:
                if len(pat) == 3 and isinstance(pat[2], str) \
                        and pat[2].startswith("?") \
                        and pat[2][1:] in self.pending_meta:
                    raise SparqlUnsupportedError(
                        "term-metadata builtins (LANG/DATATYPE/is*) on a "
                        "variable bound inside GRAPH ?var are not "
                        "supported; bind it in a constant-graph or "
                        "default-graph pattern")
            return dataset.match_quads(
                self.quads.filter(F.col("graph").isNotNull()),
                [("?" + self.graph_var, s, p, o) for s, p, o in pats],
                distinct=False, allow_cartesian=self.allow_cartesian,
                path_max_hops=self.hops)
        take = []
        for pat in pats:
            if len(pat) != 3 or isinstance(pat[1], tuple):
                continue  # sequence paths carry no single term metadata
            p, o = pat[1], pat[2]
            plain = isinstance(p, str) and (
                p.startswith("?")  # variable predicate: plain pattern
                or (not p.startswith(("!", "^")) and "|" not in p
                    and not p.endswith(("+", "*", "?"))))
            if plain and isinstance(o, str) and o.startswith("?"):
                v = o[1:]
                if v in self.pending_meta and v not in take:
                    take.append(v)
        self.pending_meta -= set(take)
        return match_bgp(self.triples, pats, distinct=False,
                         reorder=self.reorder, term_meta=take or None,
                         allow_cartesian=self.allow_cartesian,
                         path_max_hops=self.hops)

    def eval_group(self, elems: list) -> DataFrame:
        acc = None
        filters: list[str] = []
        exists: list[tuple] = []
        for el in elems:
            tag = el[0]
            if tag == "triples":
                acc = self._combine(acc, self._block(el[1]))
            elif tag == "filter":
                filters.append(el[1])
            elif tag == "exists":
                exists.append((el[1], el[2]))
            elif tag == "optional":
                acc = self._combine(acc, self.eval_group(el[2] if len(el) > 2
                                                         else el[1]), "left")
            elif tag == "minus":
                right = self.eval_group(el[1])
                shared = [c for c in right.columns if c in acc.columns]
                if not shared:
                    continue  # SPARQL: disjoint MINUS removes nothing
                acc = acc.join(right.select(*shared).distinct(),
                               shared, "left_anti")
            elif tag == "union":
                branches = [self.eval_group(g) for g in el[1]]
                all_cols = sorted({c for b in branches for c in b.columns})
                parts = [
                    b.select(*[
                        F.col(c) if c in b.columns
                        else F.lit(None).cast("string").alias(c)
                        for c in all_cols])
                    for b in branches]
                u = parts[0]
                for p in parts[1:]:
                    u = u.unionByName(p)
                acc = self._combine(acc, u)
            elif tag == "bind":
                _, var, sql = el
                if acc is None:
                    raise SparqlSyntaxError(
                        "BIND cannot start a group")
                if var in acc.columns:
                    raise SparqlSyntaxError(
                        f"BIND target ?{var} is already bound")
                acc = acc.withColumn(var, F.expr(sql))
            elif tag == "values":
                rows = el[1]
                if not rows:
                    raise SparqlSyntaxError("empty VALUES block")
                spark = self.triples.sparkSession
                cols = sorted(set().union(*[set(r) for r in rows]))
                if not cols:
                    # every row is all-UNDEF: a pure wildcard block
                    if acc is None:
                        raise SparqlUnsupportedError(
                            "VALUES with UNDEF cannot start a group; "
                            "place it after the patterns that bind its "
                            "variables")
                elif all(sorted(r) == cols for r in rows):
                    vals = spark.createDataFrame(
                        [tuple(r[c] for c in cols) for r in rows],
                        ", ".join(f"{c} string" for c in cols)).distinct()
                    acc = (F.broadcast(vals) if acc is None
                           else self._combine(acc, F.broadcast(vals)))
                else:
                    # UNDEF wildcards: group the rows by their
                    # bound-variable set and union the per-group joins —
                    # a row constrains only the variables it binds, so
                    # each group is its own broadcast semijoin against
                    # the solutions (still no driver loop over data)
                    if acc is None:
                        raise SparqlUnsupportedError(
                            "VALUES with UNDEF cannot start a group; "
                            "place it after the patterns that bind its "
                            "variables")
                    missing = [c for c in cols if c not in acc.columns]
                    if missing:
                        raise SparqlUnsupportedError(
                            "VALUES with UNDEF needs every variable "
                            f"pattern-bound; unbound: {missing}")
                    groups: dict[tuple, list] = {}
                    for r in rows:
                        groups.setdefault(tuple(sorted(r)), []).append(r)
                    out = None
                    for key, grp in sorted(groups.items()):
                        if key:
                            vals = spark.createDataFrame(
                                [tuple(r[c] for c in key) for r in grp],
                                ", ".join(f"{c} string" for c in key)
                            ).distinct()
                            part = acc.join(F.broadcast(vals),
                                            list(key), "inner")
                        else:  # all-UNDEF row: matches every solution
                            part = acc
                        out = part if out is None else out.unionByName(
                            part)
                    acc = out
            elif tag == "group":
                acc = self._combine(acc, self.eval_group(el[1]))
            elif tag == "graphpat":
                _, term, group = el
                if self.quads is None:
                    raise SparqlUnsupportedError(
                        "GRAPH needs a quad table (a `graph` column — "
                        "kg/dataset.with_graph); this input is a plain "
                        "triple table")
                if term.startswith("?"):
                    child = self._child(self.quads, graph_var=term[1:])
                else:
                    # constant graph: a scan filter — full pattern
                    # algebra (paths, term metadata) inside the scope
                    child = self._child(
                        self.quads.filter(F.col("graph") == term)
                        .drop("graph"))
                acc = self._combine(acc, child.eval_group(group))
            elif tag == "subselect":
                acc = self._combine(acc, _run_select(
                    self.triples, el[1], self, distinct_outer=False))
            else:  # pragma: no cover - parser emits only the above
                raise AssertionError(tag)
        if acc is None:
            raise SparqlSyntaxError("empty group graph pattern")
        for negate, group in exists:
            right = self.eval_group(group)
            shared = [c for c in right.columns if c in acc.columns]
            if shared:
                acc = acc.join(right.select(*shared).distinct(), shared,
                               "left_anti" if negate else "leftsemi")
            else:
                probe = right.limit(1).select(F.lit(True).alias("__e__"))
                if negate:
                    acc = acc.join(probe, F.lit(True), "left_anti")
                else:
                    acc = acc.crossJoin(probe).drop("__e__")
        for sql in filters:
            acc = acc.filter(F.expr(sql))
        return acc


def _run_select(triples: DataFrame, sel: _Select, ev: _Evaluator,
                distinct_outer: bool = True) -> DataFrame:
    sols = ev.eval_group(sel.group)
    has_agg = any(it[0] == "agg" for it in sel.items)
    if sel.group_by or has_agg:
        aggs = {}
        keep_vars = []
        for it in sel.items:
            if it[0] == "var":
                keep_vars.append(it[1])
            elif it[0] == "agg":
                aggs[it[2]] = it[1]
            else:  # plain expr over group keys
                aggs[it[2]] = it[1]
        group_by = sel.group_by or []
        bad = [v for v in keep_vars if v not in group_by]
        if bad:
            raise SparqlSyntaxError(
                f"non-aggregated SELECT variables {bad} must appear in "
                "GROUP BY")
        # HAVING references the pre-aggregation solution variables
        # (HAVING (COUNT(?f) > 1)) — compute each as a hidden boolean
        # aggregate in the same hash aggregation, filter, drop
        hidden = {f"__h{i}": h for i, h in enumerate(sel.having)}
        # expand the COUNT(DISTINCT *) sentinel against the actual
        # in-scope solution columns (distinct SOLUTIONS, per §18.5.1 —
        # struct equality treats unbound the way solution equality does)
        scope = [c for c in sols.columns if "__" not in c]
        cds = (f"count(distinct struct({', '.join(scope)}))" if scope
               else "count(distinct 1)")

        def _x(e: str) -> str:
            return e.replace(_COUNT_DISTINCT_STAR, cds)

        agg_exprs = ([F.expr(_x(e)).alias(n) for n, e in aggs.items()]
                     + [F.expr(_x(e)).alias(n) for n, e in hidden.items()])
        if not group_by:
            out = sols.agg(*agg_exprs)
        else:
            out = sols.groupBy(*group_by).agg(*agg_exprs)
        for n in hidden:
            out = out.filter(F.col(n))
        if sel.items and not sel.star:
            out = out.select(*[it[1] if it[0] == "var" else it[2]
                               for it in sel.items])
        else:
            out = out.drop(*hidden)
    else:
        out = sols
        names = []
        for it in sel.items:
            if it[0] == "var":
                names.append(it[1])
            else:
                _, sql, name = it
                if name in out.columns:
                    raise SparqlSyntaxError(
                        f"SELECT expression rebinds in-scope ?{name}")
                out = out.withColumn(name, F.expr(sql))
                names.append(name)
        if not sel.star:
            missing = [n for n in names if n not in out.columns]
            if missing:
                raise SparqlSyntaxError(
                    f"projected variables not bound: {missing}")
            out = out.select(*names)
        else:
            # drop internal term-metadata columns from * projections
            out = out.select(*[c for c in out.columns if "__" not in c])
    if sel.distinct and distinct_outer:
        out = out.distinct()
    if sel.order_by or sel.limit is not None or sel.offset is not None:
        out = solution_modifiers(out, order_by=sel.order_by or None,
                                 limit=sel.limit, offset=sel.offset)
    return out


# ------------------------------------------------------------ public API

def _apply_dataset_clause(table: DataFrame, frm: list[str],
                          named: list[str]) -> DataFrame:
    """SPARQL §13.2: a dataset clause REPLACES the dataset — the new
    default graph is the set-merge of the FROM graphs (empty without
    FROM), the named graphs are exactly the FROM NAMED set (empty
    without FROM NAMED). Both selectors are isin predicates on the
    graph column (partition-pruned on a graph-partitioned quad table);
    the merge dedups only when several graphs actually merge."""
    if not frm and not named:
        return table
    if "graph" not in table.columns:
        raise SparqlUnsupportedError(
            "FROM / FROM NAMED need a quad table (a `graph` column — "
            "kg/dataset.with_graph); this input is a plain triple table")
    cols = [c for c in table.columns if c != "graph"]
    default = table.filter(F.col("graph").isin(frm)).select(*cols)
    if len(frm) > 1:  # graph MERGE is a set union
        default = default.dropDuplicates(cols)
    default = default.withColumn("graph", F.lit(None).cast("string"))
    named_part = table.filter(F.col("graph").isin(named)) if named \
        else table.filter(F.lit(False))
    return default.select(*table.columns).unionByName(
        named_part.select(*table.columns))


def sparql(triples: DataFrame, query: str, *,
           reorder: bool | str | dict = False,
           allow_cartesian: bool = False,
           path_max_hops: int = DEFAULT_PATH_MAX_HOPS) -> DataFrame:
    """Parse and execute a SPARQL query string over the triple table.

    Returns a DataFrame: one column per projected variable (SELECT),
    one boolean ``ask`` row (ASK), or the standard six-column triple
    schema (CONSTRUCT / DESCRIBE). *reorder* applies the stats-free
    selectivity heuristic to each triple block; ``reorder="stats"``
    gathers per-predicate cardinalities first (kg/query
    predicate_stats — one bounded aggregation, amortize it by passing
    the dict directly when running many queries over one graph) and
    orders by estimated cardinality instead; *allow_cartesian*
    permits variable-disjoint pattern groups (off by default — an
    accidental cross join over 10^12 triples should be an error)."""
    if reorder == "stats":
        from .query import predicate_stats
        reorder = predicate_stats(triples)
    p = _Parser(query)
    p.parse_prologue()
    if p.at_kw("SELECT"):
        sel = p.parse_select()
        _expect_eof(p)
        eff = _apply_dataset_clause(triples, p.from_graphs, p.from_named)
        ev = _Evaluator(eff, p.meta_vars, reorder, allow_cartesian,
                        path_max_hops)
        return _run_select(eff, sel, ev)
    if p.at_kw("ASK"):
        p.next()
        frm, named = p.parse_dataset_clause()
        eff = _apply_dataset_clause(triples, frm, named)
        if p.at_kw("WHERE"):
            p.next()
        group = p.parse_group()
        _expect_eof(p)
        ev = _Evaluator(eff, p.meta_vars, reorder, allow_cartesian,
                        path_max_hops)
        sol = ev.eval_group(group)
        return sol.limit(1).agg((F.count(F.lit(1)) > 0).alias("ask"))
    if p.at_kw("CONSTRUCT"):
        p.next()
        if p.at_op("{"):
            template = _parse_template(p)
            frm, named = p.parse_dataset_clause()
            eff = _apply_dataset_clause(triples, frm, named)
            p.eat_kw("WHERE")
            group = p.parse_group()
        else:
            # §16.2.4 shorthand: CONSTRUCT WHERE { pattern } — the
            # pattern doubles as the template, so it is restricted to
            # plain triple patterns (the template grammar: no FILTER/
            # OPTIONAL/paths/sugar), which _parse_template enforces
            frm, named = p.parse_dataset_clause()
            eff = _apply_dataset_clause(triples, frm, named)
            p.eat_kw("WHERE")
            template = _parse_template(p)
            group = [("triples",
                      [(s, pred, o) for s, pred, o, _, _, _ in template])]
        # spec §16.2: solution modifiers apply to the WHERE solutions
        # BEFORE template instantiation (top-N construction)
        order_by, limit, offset = p.parse_order_limit_offset()
        _expect_eof(p)
        ev = _Evaluator(eff,
                        set(p.meta_vars) | _tmpl_obj_vars(template),
                        reorder, allow_cartesian, path_max_hops)
        sols = ev.eval_group(group)
        if order_by or limit is not None or offset is not None:
            sols = solution_modifiers(sols, order_by=order_by or None,
                                      limit=limit, offset=offset)
        return _instantiate(sols, template)
    if p.at_kw("DESCRIBE"):
        p.next()
        iris, dvars = [], []
        while True:
            t = p.peek()
            if t.kind == "VAR":
                p.next()
                dvars.append(t.text[1:])
            elif t.kind in ("IRIREF", "PNAME"):
                p.next()
                iris.append(p._iri_text(t))
            else:
                break
        spark = triples.sparkSession
        frm, named = p.parse_dataset_clause()
        eff = _apply_dataset_clause(triples, frm, named)
        # the description itself draws from the DEFAULT graph (quad
        # input: bare dataset semantics, same as bare patterns)
        desc_table = (eff.filter(F.col("graph").isNull()).drop("graph")
                      if "graph" in eff.columns else eff)
        if p.at_kw("WHERE") or p.at_op("{"):
            if p.at_kw("WHERE"):
                p.next()
            group = p.parse_group()
            _expect_eof(p)
            ev = _Evaluator(eff, p.meta_vars, reorder,
                            allow_cartesian, path_max_hops)
            sols = ev.eval_group(group)
            if not dvars:
                raise SparqlSyntaxError(
                    "DESCRIBE … WHERE needs at least one ?var")
            parts = [sols.select(F.col(v).alias("subj")) for v in dvars]
            subs = parts[0]
            for q in parts[1:]:
                subs = subs.unionByName(q)
        else:
            _expect_eof(p)
            if not iris:
                raise SparqlSyntaxError("DESCRIBE needs IRIs or ?vars")
            subs = spark.createDataFrame([(i,) for i in iris],
                                         "subj string")
        if iris and dvars:
            subs = subs.unionByName(spark.createDataFrame(
                [(i,) for i in iris], "subj string"))
        return describe(desc_table, subs.distinct())
    raise SparqlSyntaxError(
        f"expected SELECT/ASK/CONSTRUCT/DESCRIBE, got "
        f"{p.peek().text!r} (SPARQL Update strings go through "
        f"kg/update.py)")


def sparql_update(graph: DataFrame, update: str, *,
                  path_max_hops: int = DEFAULT_PATH_MAX_HOPS) -> DataFrame:
    """Parse and apply a SPARQL 1.1 Update string to the triple table;
    returns the updated graph (pure — kg/update.py semantics, including
    existing-rows-win metadata preservation and the §3.1.3 evaluate-
    against-pre-state rule for DELETE/INSERT WHERE).

    Forms: ``INSERT DATA { … }``, ``DELETE DATA { … }``,
    ``DELETE { t } INSERT { t } WHERE { g }`` (either template optional),
    ``INSERT { t } WHERE { g }``, ``DELETE WHERE { g }`` (shorthand:
    the pattern is its own delete template — plain quad patterns only,
    per spec §3.1.3.1), and ``;``-separated sequences applied left to
    right — each statement sees its predecessor's output, matching the
    spec's sequential semantics. The WHERE group takes the full SELECT
    group grammar (OPTIONAL/UNION/FILTER/…). Insert-template objects
    that are variables carry the bound term's metadata
    (is_iri/datatype/lang) when the WHERE binds it in an object
    position — the term_meta scan projection, no extra join.
    Graph-management statements (CLEAR/DROP/ADD/COPY/MOVE) operate on
    the QUAD table — use :func:`sparql_graph_update`."""
    from . import update as upd

    def apply_where(current, dels6, ins6, group, extra_meta):
        ev = _Evaluator(current, set(p.meta_vars) | extra_meta,
                        False, False, path_max_hops)
        sols = ev.eval_group(group)
        out = current
        if dels6:
            out = upd.delete_data(out, _instantiate(sols, dels6))
        if ins6:
            out = upd._merge_new(
                out, _instantiate(sols, ins6).dropDuplicates(
                    ["subj", "pred", "obj"]))
        return out

    p = _Parser(update)
    p.parse_prologue()
    out = graph
    while p.peek().kind != "EOF":
        if p.at_kw("INSERT"):
            p.next()
            if p.at_kw("DATA"):
                p.next()
                out = upd.insert_data(out, _ground_df(graph, p))
            else:
                ins = _parse_template(p)
                p.eat_kw("WHERE")
                out = apply_where(out, None, ins, p.parse_group(),
                                  _tmpl_obj_vars(ins))
        elif p.at_kw("DELETE"):
            p.next()
            if p.at_kw("DATA"):
                p.next()
                out = upd.delete_data(out, _ground_df(graph, p))
            elif p.at_kw("WHERE"):
                p.next()
                group = p.parse_group()
                pats = [pat for el in group if el[0] == "triples"
                        for pat in el[1]]
                if not pats or any(el[0] != "triples" for el in group):
                    raise SparqlUnsupportedError(
                        "DELETE WHERE takes plain quad patterns only "
                        "(spec §3.1.3.1)")
                for _, pr, _ in pats:
                    if isinstance(pr, tuple) or (
                            not pr.startswith("?") and (
                                pr.startswith(("!", "^")) or "|" in pr
                                or pr.endswith(("+", "*", "?")))):
                        raise SparqlUnsupportedError(
                            "DELETE WHERE patterns must be plain quad "
                            "patterns (spec §3.1.3.1), not property "
                            "paths")
                dels6 = [(s, pr, o, True, None, None)
                         for s, pr, o in pats]
                out = apply_where(out, dels6, None, group, set())
            else:
                dels = _parse_template(p)
                ins = None
                if p.at_kw("INSERT"):
                    p.next()
                    ins = _parse_template(p)
                p.eat_kw("WHERE")
                out = apply_where(out, dels, ins, p.parse_group(),
                                  _tmpl_obj_vars(ins or []))
        else:
            raise SparqlSyntaxError(
                f"expected INSERT/DELETE at offset {p.peek().pos}, got "
                f"{p.peek().text!r} (CLEAR/DROP/ADD/COPY/MOVE go "
                "through sparql_graph_update)")
        if p.at_op(";"):
            p.next()
    return out


def sparql_graph_update(quads: DataFrame, update: str) -> DataFrame:
    """Graph-management Update strings (spec §3.2) over the QUAD table
    (kg/dataset.py layout): ``CLEAR/DROP [SILENT] (GRAPH <g> | DEFAULT |
    NAMED | ALL)`` and ``ADD/COPY/MOVE [SILENT] (GRAPH <g> | DEFAULT) TO
    (GRAPH <g> | DEFAULT)``; ``;``-separated sequences compose."""
    from . import update as upd

    p = _Parser(update)
    p.parse_prologue()

    def graph_ref():
        if p.at_kw("DEFAULT"):
            p.next()
            return None
        if p.at_kw("GRAPH"):
            p.next()
        return p._iri_text(p.next())

    out = quads
    while p.peek().kind != "EOF":
        word = p.next()
        op = word.text.upper()
        if word.kind != "KW" or op not in (
                "CLEAR", "DROP", "ADD", "COPY", "MOVE", "CREATE"):
            raise SparqlSyntaxError(
                f"expected graph-management op at offset {word.pos}, "
                f"got {word.text!r}")
        if p.at_kw("SILENT"):
            p.next()
        if op == "CREATE":
            graph_ref()  # store does not record empty graphs: no-op
        elif op in ("CLEAR", "DROP"):
            if p.at_kw("ALL"):
                p.next()
                target = "ALL"
            elif p.at_kw("NAMED"):
                p.next()
                target = "NAMED"  # every named graph, default survives
            else:
                target = graph_ref()
            out = (upd.clear_graph if op == "CLEAR"
                   else upd.drop_graph)(out, target)
        else:
            src = graph_ref()
            to = p.next()
            if to.text.upper() != "TO":
                raise SparqlSyntaxError(
                    f"expected TO at offset {to.pos}")
            dst = graph_ref()
            fn = {"ADD": upd.add_graph, "COPY": upd.copy_graph,
                  "MOVE": upd.move_graph}[op]
            out = fn(out, src, dst)
        if p.at_op(";"):
            p.next()
    return out


def _tmpl_obj_vars(tmpl: list[tuple]) -> set[str]:
    """Variables in template OBJECT position — their term metadata
    should ride the WHERE solutions so instantiation is faithful."""
    return {o[1:] for _, _, o, _, _, _ in tmpl if o.startswith("?")}


def _ground_df(graph: DataFrame, p: _Parser) -> DataFrame:
    """INSERT/DELETE DATA block -> ground-triple DataFrame (vars are a
    syntax error per spec §3.1.1)."""
    tmpl = _parse_template(p)
    rows = []
    for s, pr, o, is_iri, dt, lang in tmpl:
        if any(t.startswith("?") for t in (s, pr, o)):
            raise SparqlSyntaxError(
                "INSERT/DELETE DATA takes ground triples only")
        rows.append((s, pr, o, bool(is_iri), dt, lang))
    return graph.sparkSession.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, obj_lang string")


def _expect_eof(p: _Parser) -> None:
    if p.peek().kind != "EOF":
        raise SparqlSyntaxError(
            f"unexpected trailing input at offset {p.peek().pos}: "
            f"{p.peek().text!r}")


def _parse_template(p: _Parser) -> list[tuple]:
    """CONSTRUCT template -> [(s, p, o, obj_is_iri, datatype, lang)]."""
    p.eat_op("{")
    p.in_template = True
    out = []
    while not p.at_op("}"):
        s, s_lit, _, _ = p.parse_term("subj")
        if s_lit:
            raise SparqlSyntaxError("literal subject in template")
        while True:
            pr = p.peek()
            if pr.kind == "VAR":
                p.next()
                pred = "?" + pr.text[1:]
            elif pr.kind == "KW" and pr.text.upper() == "A":
                p.next()
                pred = ("rdf:type" if "rdf" not in p.prefixes
                        else p.prefixes["rdf"] + "type")
            else:
                pred = p._iri_text(p.next())
            while True:
                o, o_lit, dt, lang = p.parse_term("obj")
                out.append((s, pred, o, not o_lit, dt, lang))
                if p.at_op(","):
                    p.next()
                    continue
                break
            if p.at_op(";"):
                p.next()
                if p.at_op(".", "}"):
                    break
                continue
            break
        if p.at_op("."):
            p.next()
    p.eat_op("}")
    p.in_template = False
    if not out:
        raise SparqlSyntaxError("empty CONSTRUCT template")
    return out


def _instantiate(sols: DataFrame, template: list[tuple]) -> DataFrame:
    """Template instantiation in the standard triple schema — the same
    projection-per-template-union-dedup shape as kg/query.construct,
    with two refinements: literal objects carry the datatype/lang the
    query text spells, and a VARIABLE object whose term metadata rides
    the solutions (``{var}__isiri`` columns) instantiates with the
    bound term's kind instead of the constant default. The final dedup
    is a deterministic min-struct winner per (s, p, o) — solutions can
    instantiate one key with different carried metadata, and an
    arbitrary dropDuplicates winner would vary between engines."""
    def term_col(term: str):
        if term.startswith("?"):
            return F.col(term[1:])
        return F.lit(term)

    outs = []
    for s, pred, o, is_iri, dt, lang in template:
        for t in (s, pred, o):
            if t.startswith("?") and t[1:] not in sols.columns:
                raise SparqlSyntaxError(
                    f"template variable {t!r} not bound")
        if o.startswith("?") and f"{o[1:]}__isiri" in sols.columns:
            v = o[1:]
            meta = (F.coalesce(F.col(f"{v}__isiri"), F.lit(True)),
                    F.col(f"{v}__datatype"), F.col(f"{v}__lang"))
        else:
            meta = (F.lit(bool(is_iri)), F.lit(dt).cast("string"),
                    F.lit(lang).cast("string"))
        outs.append(sols.select(
            term_col(s).cast("string").alias("subj"),
            term_col(pred).cast("string").alias("pred"),
            term_col(o).cast("string").alias("obj"),
            meta[0].alias("obj_is_iri"),
            meta[1].cast("string").alias("obj_datatype"),
            meta[2].cast("string").alias("obj_lang"),
        ).filter(F.col("subj").isNotNull() & F.col("pred").isNotNull()
                 & F.col("obj").isNotNull()))
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionByName(nxt)
    return (
        out.groupBy("subj", "pred", "obj")
        .agg(F.min(F.struct("obj_is_iri", "obj_datatype",
                            "obj_lang")).alias("_m"))
        .select("subj", "pred", "obj",
                F.col("_m.obj_is_iri").alias("obj_is_iri"),
                F.col("_m.obj_datatype").alias("obj_datatype"),
                F.col("_m.obj_lang").alias("obj_lang")))
