"""Stage 1: per-file tabular-structure extraction (imports / symbol defs /
manifest dependency rows) via vectorized Arrow UDFs.

Layout first: ``repartitionByRange(repo, path)`` colocates each repo's files
(north_rule requirement) so downstream per-repo work is shuffle-local.
Inside ``mapInPandas`` everything is pandas ``str.extractall`` — vectorized
over Arrow record batches, never row-at-a-time Python. Per-file row
numbering (`_row` = index of the structure within its file) happens here,
not in a global window (SURVEY.md §7.4-4).

The per-row invariant ``content_sha256 = sha256(content)`` is computed
JVM-side (``F.sha2``) before the UDF and carried through every stage
(BASELINE.json input_hint).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXTRACT_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content_sha256 string, kind string, name string, detail string, "
    "row_idx int"
)
#: hot-path variant: the per-row sha invariant is emitted from the source
#: scan itself (annotate.file_level_triples), so extraction need not hash +
#: Arrow-transfer it per structure row
EXTRACT_SCHEMA_NO_SHA = EXTRACT_SCHEMA.replace("content_sha256 string, ", "")

# per-language extraction rules == the CSVW-style "metadata" of the virtual
# tables (each regex plays the role of a column datatype/format annotation)
LANG_RULES: dict[str, list[tuple[str, str, int]]] = {
    # lang -> [(kind, regex-with-named-groups, flags)]
    "python": [
        ("import", r"^import\s+(?P<name>[\w.]+)(?:\s+as\s+(?P<detail>\w+))?", re.M),
        ("import", r"^from\s+(?P<name>[\w.]+)\s+import\s+(?P<detail>[\w*, ]+)", re.M),
        ("def", r"^\s*def\s+(?P<name>\w+)\s*\((?P<detail>[^)]*)\)", re.M),
        ("class", r"^\s*class\s+(?P<name>\w+)", re.M),
    ],
    "ruby": [
        ("import", r"^require\s+['\"](?P<name>[\w./-]+)['\"]", re.M),
        ("def", r"^\s*def\s+(?P<name>[\w?!]+)", re.M),
        ("class", r"^\s*class\s+(?P<name>\w+)", re.M),
    ],
    "javascript": [
        ("import", r"require\(['\"](?P<name>[\w./@-]+)['\"]\)", 0),
        ("import", r"^import\s+.*?from\s+['\"](?P<name>[\w./@-]+)['\"]", re.M),
        ("def", r"function\s+(?P<name>\w+)\s*\(", 0),
        ("class", r"class\s+(?P<name>\w+)", 0),
    ],
    "json": [
        ("dep", r"\"(?P<name>[\w./@-]+)\"\s*:\s*\"(?P<detail>[~^]?[\d][\w.+-]*)\"", 0),
    ],
    # polyglot extension (r2): same kind vocabulary (import/def/class/dep)
    # so annotation, linking and graph assembly work unchanged. Regexes stay
    # inside the Python-re ∩ RE2 common dialect (no lookaround, no
    # backrefs) so the DuckDB oracle twin matches byte-for-byte.
    "go": [
        ("import", r"^import\s+(?:(?P<detail>\w+)\s+)?\"(?P<name>[\w./-]+)\"", re.M),
        ("def", r"^func\s+(?:\([^)]*\)\s+)?(?P<name>\w+)\s*\(", re.M),
        ("class", r"^type\s+(?P<name>\w+)\s+(?P<detail>struct|interface)", re.M),
    ],
    "rust": [
        ("import", r"^use\s+(?P<name>[\w:]+)", re.M),
        ("def", r"^\s*(?:pub\s+)?fn\s+(?P<name>\w+)", re.M),
        ("class", r"^(?:pub\s+)?(?P<detail>struct|enum)\s+(?P<name>\w+)", re.M),
    ],
    "java": [
        ("import", r"^import\s+(?:static\s+)?(?P<name>[\w.]+);", re.M),
        ("class", r"(?P<detail>class|interface)\s+(?P<name>\w+)", re.M),
        ("def",
         r"(?:public|private|protected)\s+(?:static\s+)?[\w<>\[\]]+\s+(?P<name>\w+)\s*\(",
         re.M),
    ],
    "toml": [
        ("dep", r"^(?P<name>[\w-]+)\s*=\s*\"(?P<detail>[^\"]+)\"", re.M),
    ],
    "c": [
        ("import", r"^\s*#\s*include\s*[<\"](?P<name>[\w./]+)[>\"]", re.M),
        ("def",
         r"^(?:static\s+)?(?:\w+\s+)+(?P<name>\w+)\s*\([^;\n]*\)\s*\{", re.M),
        ("class", r"^(?:typedef\s+)?(?P<detail>struct|union|enum)\s+(?P<name>\w+)", re.M),
    ],
}


#: separator-packed payload of the per-file row emitted when
#: ``emit_file_rows=True``: detail = "commit|lang|sha256". commit is hex,
#: lang is from a closed set — neither can contain '|'.
FILE_ROW_KIND = "file"


def extract_structures(source: DataFrame, range_partitions: int | None = None,
                       for_streaming: bool = False,
                       layout: str = "range",
                       carry_sha: bool = True,
                       emit_file_rows: bool = False) -> DataFrame:
    """source(repo,path,commit,lang,content) -> one row per extracted
    structure.

    *layout*:

    - ``"range"`` (default): explicit ``repartitionByRange(repo, path)``
      before the UDF — the checkpointed pipeline uses this so its stage
      writes land repo-contiguous (resume ranges, partition pruning).
    - ``"source"``: trust the input table's own layout and extract
      straight off the scan. One source row IS one file, so extraction
      and per-file numbering never need colocation — and a production
      Iceberg source table at 10^12 files is already written sorted by
      (repo, path); re-shuffling 100 TB of `content` to recreate a layout
      the table already has would make the content shuffle the whole
      job's bottleneck. Scan parallelism then comes from file splits
      (size `spark.sql.files.maxPartitionBytes` accordingly).

    *for_streaming* forces the source layout (repartitionByRange is
    unsupported on streaming DataFrames; micro-batch file boundaries
    already colocate a file's rows).

    *emit_file_rows*: additionally emit ONE row per input file with
    ``kind='file'``, ``row_idx=-1`` and ``detail='commit|lang|sha256'``
    (:data:`FILE_ROW_KIND` packing). This lets the graph stages emit the
    per-file triple bundle (type/containment/lang/commit/sha) from the
    extraction output instead of RE-SCANNING the source — at 100 TB the
    second content scan would be the single largest cost in the job. The
    Arrow transfer grows by one narrow row per file, not per structure."""
    import pandas as pd

    from ..deploy import ensure_py_files

    ensure_py_files(source.sparkSession)
    if carry_sha:
        arranged = source.withColumn(
            "content_sha256", F.sha2(F.col("content"), 256))
    else:
        arranged = source
    if not (for_streaming or layout == "source"):
        n = range_partitions or source.sparkSession.sparkContext.defaultParallelism * 2
        arranged = arranged.repartitionByRange(n, "repo", "path")

    carry = ["repo", "path", "commit", "lang"] + (
        ["content_sha256"] if carry_sha else [])
    out_cols = carry + ["kind", "name", "detail", "row_idx"]

    def run(iterator):
        compiled = {
            lang: [(kind, re.compile(rx, fl)) for kind, rx, fl in rules]
            for lang, rules in LANG_RULES.items()
        }
        for pdf in iterator:
            outs = []
            file_rows = None
            if emit_file_rows and not pdf.empty:
                import hashlib

                sha = (pdf["content_sha256"] if carry_sha else pdf["content"].map(
                    lambda c: hashlib.sha256(c.encode("utf-8")).hexdigest()))
                file_rows = pd.DataFrame(
                    {c: pdf[c].values for c in carry} | {
                        "kind": FILE_ROW_KIND,
                        "name": None,
                        "detail": (pdf["commit"] + "|" + pdf["lang"] + "|" + sha).values,
                        "row_idx": -1,
                    })[out_cols]
            for lang, rules in compiled.items():
                sub = pdf[pdf["lang"] == lang]
                if sub.empty:
                    continue
                for kind, rx in rules:
                    # vectorized: one extractall per (rule, batch)
                    found = sub["content"].str.extractall(rx)
                    if found.empty:
                        continue
                    # extractall index level 0 = source row labels in `sub`
                    src_labels = found.index.get_level_values(0)
                    src = sub.loc[src_labels]
                    frame = pd.DataFrame(
                        {c: src[c].values for c in carry} | {
                            "kind": kind,
                            "name": found["name"].values,
                            "detail": found["detail"].values
                            if "detail" in found else None,
                        })
                    outs.append(frame)
            if not outs:
                if file_rows is not None:
                    yield file_rows
                else:
                    yield pd.DataFrame({c: [] for c in out_cols})
                continue
            allf = pd.concat(outs, ignore_index=True)
            # per-file structure numbering — no global window (C16 analog)
            allf["row_idx"] = allf.groupby(["repo", "path"]).cumcount().astype("int32")
            if file_rows is not None:
                allf = pd.concat([allf, file_rows], ignore_index=True)
            yield allf

    return arranged.mapInPandas(
        run, schema=EXTRACT_SCHEMA if carry_sha else EXTRACT_SCHEMA_NO_SHA)
