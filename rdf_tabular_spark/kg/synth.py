"""Deterministic synthetic source-code repository table (input_hint shape:
repo, path, commit, lang, content).

Generated **distributed and seed-stable**: every field is a pure function
of (sf, row index) via sha256 — no RNG state, no driver-side materialization
— so the same (sf, n_rows) always produces byte-identical content on any
cluster size (the per-row invariant sha256(content) is reproducible).

Skew by design: repo 0 is a hot "monorepo" holding ~30% of all files
(FIXTURES.md F10) to exercise salting/AQE paths.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "ruby", "javascript", "json"]
#: extraction supports these too (r2); kept OUT of the default synth mix so
#: benchmark/scaling inputs stay byte-identical round over round — the
#: polyglot oracle/table stages its own source with these
POLY_LANGS = ["go", "rust", "java", "toml", "c"]

_MODULES = [
    "os", "sys", "json", "requests", "numpy", "pandas", "flask", "django",
    "pyspark", "scipy", "sklearn", "torch", "re", "math", "itertools",
    "collections", "logging", "asyncio", "typing", "functools",
]
_SYMBOLS = [
    "load", "save", "parse", "render", "main", "run", "init", "update",
    "fetch", "push", "merge", "split", "encode", "decode", "validate",
    "transform", "extract", "emit", "link", "dedupe",
]


def _h(*parts: object) -> int:
    return int.from_bytes(
        hashlib.sha256("|".join(map(str, parts)).encode()).digest()[:8], "big")


def make_content(i: int, lang: str) -> str:
    """Pure function (i, lang) -> file text with imports/defs/manifest rows."""
    n_imports = 2 + _h("ni", i) % 6
    n_defs = 1 + _h("nd", i) % 5
    lines = []
    if lang == "python":
        for k in range(n_imports):
            m = _MODULES[_h("im", i, k) % len(_MODULES)]
            if _h("alias", i, k) % 3 == 0:
                lines.append(f"import {m} as {m[:2]}{k}")
            else:
                lines.append(f"from {m} import {_SYMBOLS[_h('sym', i, k) % len(_SYMBOLS)]}")
        lines.append("")
        for k in range(n_defs):
            s = _SYMBOLS[_h("def", i, k) % len(_SYMBOLS)]
            if _h("kind", i, k) % 4 == 0:
                lines.append(f"class {s.title()}Handler:")
                lines.append(f"    def {s}(self, x):")
                lines.append("        return x")
            else:
                lines.append(f"def {s}_{k}(x):")
                lines.append("    return x")
    elif lang == "ruby":
        for k in range(n_imports):
            m = _MODULES[_h("im", i, k) % len(_MODULES)]
            lines.append(f"require '{m}'")
        for k in range(n_defs):
            s = _SYMBOLS[_h("def", i, k) % len(_SYMBOLS)]
            lines.append(f"def {s}_{k}(x)")
            lines.append("  x")
            lines.append("end")
    elif lang == "javascript":
        for k in range(n_imports):
            m = _MODULES[_h("im", i, k) % len(_MODULES)]
            lines.append(f"const {m}{k} = require('{m}');")
        for k in range(n_defs):
            s = _SYMBOLS[_h("def", i, k) % len(_SYMBOLS)]
            lines.append(f"function {s}_{k}(x) {{ return x; }}")
    elif lang == "go":
        lines.append("package main")
        lines.append("")
        for k in range(n_imports):
            m = _MODULES[_h("im", i, k) % len(_MODULES)]
            if _h("alias", i, k) % 3 == 0:
                lines.append(f'import {m[:2]}{k} "github.com/org/{m}"')
            else:
                lines.append(f'import "github.com/org/{m}"')
        lines.append("")
        for k in range(n_defs):
            s = _SYMBOLS[_h("def", i, k) % len(_SYMBOLS)]
            if _h("kind", i, k) % 4 == 0:
                lines.append(f"type {s.title()}Handler struct {{")
                lines.append("}")
            else:
                lines.append(f"func {s}_{k}(x int) int {{")
                lines.append("\treturn x")
                lines.append("}")
    elif lang == "rust":
        for k in range(n_imports):
            m = _MODULES[_h("im", i, k) % len(_MODULES)]
            lines.append(f"use {m}::prelude;")
        lines.append("")
        for k in range(n_defs):
            s = _SYMBOLS[_h("def", i, k) % len(_SYMBOLS)]
            if _h("kind", i, k) % 4 == 0:
                word = "struct" if _h("se", i, k) % 2 == 0 else "enum"
                lines.append(f"pub {word} {s.title()}Handler {{")
                lines.append("}")
            else:
                pub = "pub " if _h("pub", i, k) % 2 == 0 else ""
                lines.append(f"{pub}fn {s}_{k}(x: i32) -> i32 {{")
                lines.append("    x")
                lines.append("}")
    elif lang == "java":
        for k in range(n_imports):
            m = _MODULES[_h("im", i, k) % len(_MODULES)]
            if _h("static", i, k) % 4 == 0:
                lines.append(f"import static org.example.{m}.Util;")
            else:
                lines.append(f"import org.example.{m};")
        lines.append("")
        lines.append(f"public class File{i}Handler {{")
        for k in range(n_defs):
            s = _SYMBOLS[_h("def", i, k) % len(_SYMBOLS)]
            lines.append(f"    public static int {s}_{k}(int x) {{ return x; }}")
        lines.append("}")
    elif lang == "c":
        for k in range(n_imports):
            m = _MODULES[_h("im", i, k) % len(_MODULES)]
            if _h("sys", i, k) % 2 == 0:
                lines.append(f"#include <{m}.h>")
            else:
                lines.append(f'#include "{m}.h"')
        lines.append("")
        for k in range(n_defs):
            s = _SYMBOLS[_h("def", i, k) % len(_SYMBOLS)]
            if _h("kind", i, k) % 4 == 0:
                word = "struct" if _h("su", i, k) % 2 == 0 else "enum"
                lines.append(f"{word} {s}_ctx {{")
                lines.append("    int x;")
                lines.append("};")
            else:
                static = "static " if _h("st", i, k) % 2 == 0 else ""
                lines.append(f"{static}int {s}_{k}(int x) {{")
                lines.append("    return x;")
                lines.append("}")
    elif lang == "toml":
        lines.append("[dependencies]")
        for k in range(n_imports):
            m = _MODULES[_h("im", i, k) % len(_MODULES)]
            lines.append(
                f'{m} = "^{_h("v", i, k) % 9}.{_h("v2", i, k) % 20}.0"')
    else:  # json manifest
        deps = []
        for k in range(n_imports):
            m = _MODULES[_h("im", i, k) % len(_MODULES)]
            deps.append(f'    "{m}": "^{_h("v", i, k) % 9}.{_h("v2", i, k) % 20}.0"')
        lines.append("{")
        lines.append(f'  "name": "pkg-{i}",')
        lines.append('  "dependencies": {')
        lines.append(",\n".join(deps))
        lines.append("  }")
        lines.append("}")
    return "\n".join(lines) + "\n"


def repo_for(i: int, n_repos: int, hot: bool = True) -> str:
    # ~30% of files land in the hot monorepo (skew by design);
    # hot=False gives the uniform control corpus for skew benchmarks
    if hot and _h("hot", i) % 10 < 3:
        return "repo-0000-monorepo"
    return f"repo-{1 + _h('repo', i) % (n_repos - 1):04d}"


#: the hot-module line per language (skew bench: one module imported by
#: ~90% of files — VERDICT r2 item 6); json inserts into dependencies
_HOT_IMPORT = {
    "python": "import requests",
    "ruby": "require 'requests'",
    "javascript": "const requests_hot = require('requests');",
}


def with_hot_module(content: str, lang: str) -> str:
    """Prepend/insert an import of the hot module into generated content."""
    if lang == "json":
        return content.replace(
            '"dependencies": {\n',
            '"dependencies": {\n    "requests": "^1.0.0",\n', 1)
    line = _HOT_IMPORT.get(lang)
    return f"{line}\n{content}" if line else content


def lang_for(i: int) -> str:
    return LANGS[_h("lang", i) % len(LANGS)]


def synth_source_table(
    spark: SparkSession, n_files: int, n_repos: int | None = None,
    partitions: int | None = None,
    hot_repo: bool = True, hot_module_frac: float = 0.0,
) -> DataFrame:
    """Build the source table distributed: spark.range -> mapInPandas
    (content is a pure function of the row index).

    *hot_repo* False removes the 30% monorepo (uniform control);
    *hot_module_frac* > 0 makes that fraction of files import the hot
    module (``requests``) on top of their generated imports — the
    adversarial key-skew corpus for the skew benchmarks. Defaults
    reproduce the round-1/2 corpus byte-for-byte."""
    import pandas as pd

    from ..deploy import ensure_py_files

    ensure_py_files(spark)
    n_repos = n_repos or max(10, n_files // 200)
    rng = spark.range(0, n_files, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(iterator):
        for pdf in iterator:
            rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
            for i in pdf["id"].astype("int64"):
                i = int(i)
                lang = lang_for(i)
                ext = {"python": "py", "ruby": "rb", "javascript": "js", "json": "json"}[lang]
                content = make_content(i, lang)
                if hot_module_frac > 0 and (
                        _h("hotmod", i) % 1000 < hot_module_frac * 1000):
                    content = with_hot_module(content, lang)
                rows["repo"].append(repo_for(i, n_repos, hot=hot_repo))
                rows["path"].append(
                    f"src/{_h('d1', i) % 20:02d}/{_h('d2', i) % 50:02d}/file_{i}.{ext}")
                rows["commit"].append(hashlib.sha1(f"commit|{i}".encode()).hexdigest())
                rows["lang"].append(lang)
                rows["content"].append(content)
            yield pd.DataFrame(rows)

    schema = "repo string, path string, commit string, lang string, content string"
    return rng.mapInPandas(gen, schema=schema)
