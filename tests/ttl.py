"""Minimal Turtle parser + blank-node-safe graph comparison for golden tests.

Covers the Turtle subset used by the reference's golden fixtures
(spec/data/*-minimal.ttl): prefixes, pnames, IRIs, anonymous subjects
``[ ... ]``, ``;``/``,`` continuations, typed/lang literals, bare
numeric/boolean literals, and collections ``( ... )``.

Comparison canonicalizes blank nodes by iterative signature refinement and
compares triple multisets, reporting precision/recall (the BASELINE P/R
gate is defined on this).
"""

from __future__ import annotations

import re
from collections import Counter

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

Triple = tuple  # (subj, pred, obj, obj_is_iri, obj_datatype, obj_lang)

_TOKEN = re.compile(
    r"""
    (?P<iri><[^>]*>)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<lang>@[a-zA-Z][a-zA-Z0-9-]*)
  | (?P<dtsep>\^\^)
  | (?P<punct>[;,.\[\]()])
  | (?P<pname>[A-Za-z0-9_][\w.%-]*:[\w.%-]*|:[\w.%-]+|[A-Za-z][\w-]*)
  | (?P<num>[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
    """,
    re.X,
)


def _unescape(s: str) -> str:
    return (
        s.replace("\\\"", '"').replace("\\n", "\n").replace("\\t", "\t")
        .replace("\\r", "\r").replace("\\\\", "\\")
    )


class TurtleParser:
    def __init__(self, text: str):
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None
        self.triples: list[Triple] = []
        self._bnode_n = 0
        self.tokens = self._tokenize(text)
        self.pos = 0

    def _tokenize(self, text: str):
        # strip @prefix lines first
        body_lines = []
        for line in text.splitlines():
            m = re.match(r"\s*@prefix\s+([\w-]*):\s*<([^>]*)>\s*\.", line)
            mb = re.match(r"\s*@base\s+<([^>]*)>\s*\.", line)
            if m:
                self.prefixes[m.group(1)] = m.group(2)
            elif mb:
                self.base = mb.group(1)
            else:
                body_lines.append(line)
        toks = []
        for m in _TOKEN.finditer("\n".join(body_lines)):
            kind = m.lastgroup
            if kind in ("ws", "comment"):
                continue
            toks.append((kind, m.group(0)))
        return toks

    def _iri(self, tok: str) -> str:
        """<...> token -> absolute IRI (resolved against @base if present)."""
        iri = tok[1:-1]
        if self.base:
            from urllib.parse import urljoin

            return urljoin(self.base, iri)
        return iri

    def _new_bnode(self) -> str:
        self._bnode_n += 1
        return f"_:gb{self._bnode_n}"

    def peek(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else (None, None)

    def next(self):
        t = self.peek()
        self.pos += 1
        return t

    def parse(self) -> list[Triple]:
        while self.pos < len(self.tokens):
            self._statement()
        return self.triples

    def _resolve_pname(self, p: str) -> str:
        if p == "a":
            return RDF_NS + "type"
        if p.startswith("_:"):  # labeled blank node
            if not hasattr(self, "_bnode_labels"):
                self._bnode_labels: dict[str, str] = {}
            if p not in self._bnode_labels:
                self._bnode_labels[p] = self._new_bnode()
            return self._bnode_labels[p]
        pre, _, local = p.partition(":")
        if pre in self.prefixes:
            return self.prefixes[pre] + local
        raise ValueError(f"unknown prefix in {p!r}")

    def _statement(self):
        subj = self._node(subject=True)
        if self.peek()[1] != ".":  # "[ ... ] ." has no trailing p-o list
            self._predicate_object_list(subj)
        kind, tok = self.next()
        assert tok == ".", f"expected '.', got {tok!r}"

    def _predicate_object_list(self, subj: str):
        while True:
            kind, tok = self.next()
            if tok == "a":
                pred = RDF_NS + "type"
            elif kind == "iri":
                pred = self._iri(tok)
            elif kind == "pname":
                pred = self._resolve_pname(tok)
            else:
                raise ValueError(f"bad predicate {tok!r}")
            while True:
                self._object(subj, pred)
                if self.peek()[1] == ",":
                    self.next()
                    continue
                break
            if self.peek()[1] == ";":
                self.next()
                if self.peek()[1] in (".", "]", None):
                    break
                continue
            break

    def _node(self, subject=False) -> str:
        kind, tok = self.next()
        if kind == "iri":
            return self._iri(tok)
        if kind == "pname":
            return self._resolve_pname(tok)
        if tok == "[":
            b = self._new_bnode()
            if self.peek()[1] != "]":
                self._predicate_object_list(b)
            kind, tok = self.next()
            assert tok == "]", f"expected ']', got {tok!r}"
            return b
        raise ValueError(f"bad node {tok!r}")

    def _object(self, subj: str, pred: str):
        kind, tok = self.peek()
        if kind == "string":
            self.next()
            lex = _unescape(tok[1:-1])
            dt, lang = None, None
            k2, t2 = self.peek()
            if k2 == "dtsep":
                self.next()
                k3, t3 = self.next()
                dt = self._iri(t3) if k3 == "iri" else self._resolve_pname(t3)
            elif k2 == "lang":
                self.next()
                lang = t2[1:]
            self.triples.append((subj, pred, lex, False, dt, lang))
        elif kind == "num":
            self.next()
            if re.fullmatch(r"[+-]?\d+", tok):
                dt = XSD + "integer"
            elif "e" in tok.lower():
                dt = XSD + "double"
            else:
                dt = XSD + "decimal"
            self.triples.append((subj, pred, tok, False, dt, None))
        elif kind == "pname" and tok in ("true", "false"):
            self.next()
            self.triples.append((subj, pred, tok, False, XSD + "boolean", None))
        elif tok == "(":
            self.next()
            items = []
            while self.peek()[1] != ")":
                holder = self._new_bnode()  # placeholder: collect then link
                items.append(self._collect_object())
            self.next()
            node = RDF_NS + "nil"
            chain = []
            for _ in items:
                chain.append(self._new_bnode())
            for i, item in enumerate(items):
                self.triples.append((chain[i], RDF_NS + "first", *item))
                nxt = chain[i + 1] if i + 1 < len(items) else RDF_NS + "nil"
                self.triples.append((chain[i], RDF_NS + "rest", nxt, True, None, None))
            head = chain[0] if chain else RDF_NS + "nil"
            self.triples.append((subj, pred, head, True, None, None))
        else:
            node = self._node()
            self.triples.append((subj, pred, node, True, None, None))

    def _collect_object(self):
        """Parse one object token-group, return (obj, is_iri, dt, lang)."""
        kind, tok = self.peek()
        if kind == "string":
            self.next()
            lex = _unescape(tok[1:-1])
            dt, lang = None, None
            k2, t2 = self.peek()
            if k2 == "dtsep":
                self.next()
                k3, t3 = self.next()
                dt = self._iri(t3) if k3 == "iri" else self._resolve_pname(t3)
            elif k2 == "lang":
                self.next()
                lang = t2[1:]
            return (lex, False, dt, lang)
        if kind == "num":
            self.next()
            dt = XSD + ("integer" if re.fullmatch(r"[+-]?\d+", tok) else "decimal")
            return (tok, False, dt, None)
        node = self._node()
        return (node, True, None, None)


def parse_ttl(text: str) -> list[Triple]:
    return TurtleParser(text).parse()


# --------------------------------------------------------------------------
# graph comparison
# --------------------------------------------------------------------------

def _is_bnode(x) -> bool:
    return isinstance(x, str) and x.startswith("_:")


def canonicalize(triples: list[Triple], rounds: int = 4) -> Counter:
    """Multiset of triples with blank nodes replaced by structural
    signatures (iterative refinement — WL-style coloring)."""
    sig: dict[str, str] = {}
    bnodes = {t[0] for t in triples if _is_bnode(t[0])} | {
        t[2] for t in triples if t[3] and _is_bnode(t[2])}
    for b in bnodes:
        sig[b] = "B"

    def label(x):
        return sig[x] if _is_bnode(x) else ("I:" + str(x))

    for _ in range(rounds):
        new_sig = {}
        for b in bnodes:
            out_edges = sorted(
                f"O|{t[1]}|{label(t[2]) if (t[3] and _is_bnode(t[2])) else (t[2], t[3], t[4], t[5])}"
                for t in triples if t[0] == b)
            in_edges = sorted(
                f"I|{t[1]}|{label(t[0])}" for t in triples
                if t[3] and t[2] == b and _is_bnode(t[0]))
            new_sig[b] = "B{" + ";".join(out_edges + in_edges) + "}"
        sig = new_sig

    out = Counter()
    for s, p, o, is_iri, dt, lang in triples:
        cs = sig[s] if _is_bnode(s) else s
        co = sig[o] if (is_iri and _is_bnode(o)) else o
        out[(cs, p, co, bool(is_iri), dt, lang)] += 1
    return out


def compare_graphs(ours: list[Triple], golden: list[Triple]) -> dict:
    a, b = canonicalize(ours), canonicalize(golden)
    inter = sum((a & b).values())
    na, nb = sum(a.values()), sum(b.values())
    return {
        "precision": inter / na if na else 1.0,
        "recall": inter / nb if nb else 1.0,
        "ours": na,
        "golden": nb,
        "missing": list((b - a).keys())[:10],
        "extra": list((a - b).keys())[:10],
    }


def spark_triples(df) -> list[Triple]:
    return [
        (r.subj, r.pred, r.obj, bool(r.obj_is_iri), r.obj_datatype, r.obj_lang)
        for r in df.collect()
    ]
