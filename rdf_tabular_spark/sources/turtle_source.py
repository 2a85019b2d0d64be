"""Turtle SOURCE — the inverse of operators/turtle.py's sink.

The reference both consumes and emits Turtle through rdf.rb (its own
spec fixtures are ``spec/data/*.ttl``); this is the distributed analog.
Turtle statements span lines and prefixes scope the whole document, so
the parallel unit is the FILE, not the line: ``read_turtle`` scans a
directory with the ``binaryFile`` reader (one row per file, executor-
side) and parses each file's text inside an Arrow-batched
``mapInPandas`` — a corpus of millions of .ttl files parses with full
cluster parallelism, while a single giant file belongs to the
line-parallel N-Triples path (operators/ntriples.py) instead.

Blank-node labels are file-scoped in Turtle: two files both saying
``_:b0`` mean two different nodes, so the reader namespaces every label
(and every anonymous node) with a per-file md5 tag by default.

Grammar subset (the sink's output plus common foreign Turtle):
``@prefix``/``@base`` and SPARQL-style ``PREFIX``/``BASE`` directives,
pname compaction, ``a``, ``;``/``,`` continuations, labeled and
anonymous blank nodes (``[ … ]`` property lists), collections
``( … )``, short and long (triple-quoted) string literals in either
quote char with full escape decode (incl. ``\\uXXXX``/``\\UXXXXXXXX``),
``@lang`` / ``^^datatype``, and bare numeric / boolean literals typed
per the Turtle grammar (xsd:integer / xsd:decimal / xsd:double /
xsd:boolean).
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urljoin

from pyspark.sql import DataFrame

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

NT_SCHEMA = ("subj string, pred string, obj string, obj_is_iri boolean, "
             "obj_datatype string, obj_lang string")

_TOKEN = re.compile(
    r"""
    (?P<comment>\#[^\n\r]*)
  | (?P<iri><[^<>"{}|^`\\\x00-\x20]*>)
  | (?P<string3>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"
               |'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<string>"(?:[^"\\\n\r]|\\.)*"|'(?:[^'\\\n\r]|\\.)*')
  | (?P<atkw>@prefix\b|@base\b)
  | (?P<lang>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<dtsep>\^\^)
  | (?P<bnode>_:[A-Za-z0-9][A-Za-z0-9._-]*)
  | (?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<punct>[;,.\[\]()])
  | (?P<pname>(?:[A-Za-z][\w.-]*)?:[\w.%-]*|[A-Za-z][\w-]*)
  | (?P<ws>\s+)
    """,
    re.X,
)

_ESC = re.compile(r"\\(?:u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)")
_SIMPLE = {"\\n": "\n", "\\r": "\r", "\\t": "\t", "\\b": "\b",
           "\\f": "\f", '\\"': '"', "\\'": "'", "\\\\": "\\"}


def _decode(raw: str) -> str:
    def sub(m):
        t = m.group(0)
        if t in _SIMPLE:
            return _SIMPLE[t]
        if t[1] in "uU":
            return chr(int(t[2:], 16))
        return t[1:]
    return _ESC.sub(sub, raw)


class TurtleSyntaxError(ValueError):
    pass


class _TurtleParser:
    def __init__(self, text: str, bnode_ns: str = ""):
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None
        self.ns = bnode_ns
        self.triples: list[tuple] = []
        self._anon = 0
        self.toks: list[tuple[str, str, int]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN.match(text, pos)
            if not m:
                raise TurtleSyntaxError(
                    f"cannot tokenize at offset {pos}: {text[pos:pos+20]!r}")
            kind = m.lastgroup
            pos = m.end()
            if kind in ("ws", "comment"):
                continue
            self.toks.append((kind, m.group(0), m.start()))
        self.toks.append(("eof", "", len(text)))
        self.i = 0

    # -- token helpers ---------------------------------------------------
    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def _eat_punct(self, ch: str):
        k, v, p = self.next()
        if k != "punct" or v != ch:
            raise TurtleSyntaxError(f"expected {ch!r} at offset {p}, "
                                    f"got {v!r}")

    def _at_punct(self, *chs: str) -> bool:
        k, v, _ = self.peek()
        return k == "punct" and v in chs

    # -- term production --------------------------------------------------
    def _resolve_iri(self, raw: str) -> str:
        body = _decode(raw[1:-1])
        if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", body):
            return urljoin(self.base, body)
        return body

    def _resolve_pname(self, raw: str, pos: int) -> str:
        if ":" not in raw:
            raise TurtleSyntaxError(
                f"bare word {raw!r} at offset {pos} is not a term")
        pfx, local = raw.split(":", 1)
        if pfx not in self.prefixes:
            # undeclared prefix kept verbatim — matches the engine's
            # compact-term storage convention (kg/sparql.py prologue)
            return raw
        return self.prefixes[pfx] + local

    def _fresh_bnode(self) -> str:
        self._anon += 1
        return f"_:{self.ns}anon{self._anon}"

    def _label_bnode(self, raw: str) -> str:
        return f"_:{self.ns}{raw[2:]}" if self.ns else raw

    def _term(self, as_subject: bool = False):
        """-> (text, is_iri, datatype, lang)"""
        k, v, p = self.peek()
        if k == "iri":
            self.next()
            return (self._resolve_iri(v), True, None, None)
        if k == "bnode":
            self.next()
            return (self._label_bnode(v), True, None, None)
        if k == "pname":
            if v in ("true", "false"):
                self.next()
                return (v, False, XSD + "boolean", None)
            self.next()
            return (self._resolve_pname(v, p), True, None, None)
        if k in ("string", "string3"):
            self.next()
            body = v[3:-3] if k == "string3" else v[1:-1]
            text = _decode(body)
            nk, nv, _ = self.peek()
            if nk == "lang":
                self.next()
                return (text, False, None, nv[1:])
            if nk == "dtsep":
                self.next()
                dk, dv, dp = self.next()
                if dk == "iri":
                    return (text, False, self._resolve_iri(dv), None)
                if dk == "pname":
                    return (text, False, self._resolve_pname(dv, dp), None)
                raise TurtleSyntaxError(
                    f"expected datatype IRI at offset {dp}")
            return (text, False, None, None)
        if k == "num":
            self.next()
            if re.fullmatch(r"[+-]?\d+", v):
                dt = XSD + "integer"
            elif "e" in v.lower():
                dt = XSD + "double"
            else:
                dt = XSD + "decimal"
            return (v, False, dt, None)
        if k == "punct" and v == "[":
            self.next()
            node = self._fresh_bnode()
            if not self._at_punct("]"):
                self._predicate_object_list(node)
            self._eat_punct("]")
            return (node, True, None, None)
        if k == "punct" and v == "(":
            self.next()
            return (self._collection(), True, None, None)
        raise TurtleSyntaxError(f"expected term at offset {p}, got {v!r}")

    def _collection(self) -> str:
        items = []
        while not self._at_punct(")"):
            items.append(self._term())
        self._eat_punct(")")
        if not items:
            return RDF_NS + "nil"
        nodes = [self._fresh_bnode() for _ in items]
        for node, (text, is_iri, dt, lang), nxt in zip(
                nodes, items, nodes[1:] + [RDF_NS + "nil"]):
            self.triples.append((node, RDF_NS + "first", text,
                                 is_iri, dt, lang))
            self.triples.append((node, RDF_NS + "rest", nxt,
                                 True, None, None))
        return nodes[0]

    # -- statement structure ----------------------------------------------
    def _verb(self) -> str:
        k, v, p = self.peek()
        if k == "pname" and v == "a":
            self.next()
            return RDF_NS + "type"
        if k == "iri":
            self.next()
            return self._resolve_iri(v)
        if k == "pname":
            self.next()
            return self._resolve_pname(v, p)
        raise TurtleSyntaxError(f"expected predicate at offset {p}, "
                                f"got {v!r}")

    def _predicate_object_list(self, subj: str):
        while True:
            pred = self._verb()
            while True:
                text, is_iri, dt, lang = self._term()
                self.triples.append((subj, pred, text, is_iri, dt, lang))
                if self._at_punct(","):
                    self.next()
                    continue
                break
            if self._at_punct(";"):
                while self._at_punct(";"):
                    self.next()
                if self._at_punct(".", "]"):
                    return
                continue
            return

    def _directive(self) -> bool:
        k, v, _ = self.peek()
        low = v.lower()
        if k == "atkw" or (k == "pname" and low in ("prefix", "base")):
            sparql_style = k == "pname"
            self.next()
            if low.endswith("prefix"):
                pk, pv, pp = self.next()
                if pk != "pname" or not pv.endswith(":"):
                    raise TurtleSyntaxError(
                        f"expected 'name:' at offset {pp}, got {pv!r}")
                ik, iv, ip = self.next()
                if ik != "iri":
                    raise TurtleSyntaxError(
                        f"expected IRI at offset {ip}")
                self.prefixes[pv[:-1]] = self._resolve_iri(iv)
            else:
                ik, iv, ip = self.next()
                if ik != "iri":
                    raise TurtleSyntaxError(f"expected IRI at offset {ip}")
                self.base = self._resolve_iri(iv)
            if not sparql_style:
                self._eat_punct(".")
            elif self._at_punct("."):
                self.next()
            return True
        return False

    def parse(self) -> list[tuple]:
        while self.peek()[0] != "eof":
            if self._directive():
                continue
            k, v, _ = self.peek()
            if k == "punct" and v == "[":
                subj, _, _, _ = self._term()
                # subject-position [ … ] may stand alone as a statement
                if not self._at_punct("."):
                    self._predicate_object_list(subj)
            elif k == "punct" and v == "(":
                subj = self._term()[0]
                self._predicate_object_list(subj)
            else:
                subj, is_iri, _, _ = self._term(as_subject=True)
                if not is_iri:
                    raise TurtleSyntaxError(
                        f"literal in subject position: {subj!r}")
                self._predicate_object_list(subj)
            self._eat_punct(".")
        return self.triples


def parse_turtle(text: str, bnode_ns: str = "") -> list[tuple]:
    """Turtle document text -> list of standard triple tuples."""
    return _TurtleParser(text, bnode_ns).parse()


def _file_ns(path: str) -> str:
    return "f" + hashlib.md5(path.encode("utf-8")).hexdigest()[:8] + "_"


def read_turtle(spark, path: str, *, namespace_bnodes: bool = True,
                pattern: str = "*.ttl",
                prelude: str = "") -> DataFrame:
    """Distributed Turtle directory scan -> triple DataFrame.

    One row per FILE via the binaryFile reader, parsed in an
    Arrow-batched mapInPandas — per-file parallelism, the natural unit
    for a many-file corpus. *prelude* (e.g. a shared ``@prefix`` header
    like the sink's ``_prefixes.ttl``) is prepended to every file's
    text. Blank-node labels get a per-file md5 namespace unless
    *namespace_bnodes* is False."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", pattern).load(path)
             .select("path", "content"))

    def batches(it):
        import pandas as pd
        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                ns = _file_ns(p) if namespace_bnodes else ""
                text = prelude + bytes(content).decode("utf-8")
                rows.extend(parse_turtle(text, ns))
            yield pd.DataFrame(
                rows, columns=["subj", "pred", "obj", "obj_is_iri",
                               "obj_datatype", "obj_lang"])

    return files.mapInPandas(batches, NT_SCHEMA)


def parse_turtle_blocks(blocks: DataFrame,
                        prefixes: dict[str, str]) -> DataFrame:
    """Parse the sink's in-memory block stream (operators/turtle.
    to_turtle_blocks output — column ``block``) back to triples: each
    block is a self-contained statement, so the prefix header is a
    driver-constant prelude and parsing is map-only per batch."""
    prelude = "".join(f"@prefix {k}: <{v}> .\n"
                      for k, v in sorted(prefixes.items()))

    def batches(it):
        import pandas as pd
        for pdf in it:
            rows = []
            for block in pdf["block"]:
                rows.extend(parse_turtle(prelude + block))
            yield pd.DataFrame(
                rows, columns=["subj", "pred", "obj", "obj_is_iri",
                               "obj_datatype", "obj_lang"])

    return blocks.select("block").mapInPandas(batches, NT_SCHEMA)


def read_turtle_dataset(spark, path: str) -> DataFrame:
    """Read back a directory written by operators/turtle.write_turtle:
    the tiny ``_prefixes.ttl`` header is read driver-side and prepended
    to every block part-file (each block is self-contained, so part
    files parse independently in parallel)."""
    import os

    header_path = os.path.join(path, "_prefixes.ttl")
    with open(header_path, encoding="utf-8") as f:
        prelude = f.read()
    return read_turtle(spark, os.path.join(path, "blocks"),
                       pattern="part-*", prelude=prelude,
                       namespace_bnodes=False)
