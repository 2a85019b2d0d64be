"""Dialect-aware scan (S1-S6) unit tests, mirroring the reference's
row/cell-iteration cases (metadata_spec.rb:1030-1091): skipRows,
headerRowCount, commentPrefix, skipBlankRows, skipColumns, delimiter,
trim, and row/sourceRow numbering."""

from __future__ import annotations

import json
import os

import pytest

from tests.conftest import FIXTURE_DIR


def _scan(spark, tmp_path, content: str, dialect: dict, columns=None):
    from rdf_tabular_spark.csvw.metadata import parse_metadata
    from rdf_tabular_spark.sources.csv_source import read_table

    p = tmp_path / "t.csv"
    p.write_text(content)
    meta = {
        "@context": "http://www.w3.org/ns/csvw",
        "url": "http://example.org/t.csv",
        "dialect": dialect,
    }
    if columns is not None:
        meta["tableSchema"] = {"columns": columns}
    group = parse_metadata(meta, base="http://example.org/meta.json")
    table = group.tables[0]
    return read_table(spark, table, str(p)), table


def test_skip_rows_and_header(spark, tmp_path):
    """skipRows=1 then header; skipped region + header feed embedded
    metadata; data rows numbered from 1, sourceRow = physical line."""
    content = "# a comment line\ncol_a,col_b\n1,x\n2,y\n"
    scan, _ = _scan(spark, tmp_path, content,
                    {"skipRows": 1, "commentPrefix": "#"})
    rows = sorted(scan.df.collect(), key=lambda r: r["_row"])
    assert scan.header_titles == ["col_a", "col_b"]
    # prefix removed, then stripped (reference metadata.rb:1851 / 884)
    assert scan.comments == ["a comment line"]
    assert [(r["_row"], r["_sourceRow"], r["_c0"], r["_c1"]) for r in rows] == [
        (1, 3, "1", "x"), (2, 4, "2", "y")]


def test_comment_rows_removed_from_data(spark, tmp_path):
    content = "a,b\n1,x\n#mid comment\n2,y\n"
    scan, _ = _scan(spark, tmp_path, content, {"commentPrefix": "#"})
    rows = sorted(scan.df.collect(), key=lambda r: r["_row"])
    assert [(r["_row"], r["_sourceRow"]) for r in rows] == [(1, 2), (2, 4)]
    assert scan.comments == ["mid comment"]


def test_skip_blank_rows(spark, tmp_path):
    content = "a,b\n1,x\n,\n2,y\n"
    scan, _ = _scan(spark, tmp_path, content, {"skipBlankRows": True})
    rows = sorted(scan.df.collect(), key=lambda r: r["_row"])
    assert [(r["_row"], r["_c0"]) for r in rows] == [(1, "1"), (2, "2")]


def test_skip_columns_and_tsv(spark, tmp_path):
    content = "skipme\tA\tB\n0\t1\tx\n0\t2\ty\n"
    scan, _ = _scan(spark, tmp_path, content,
                    {"delimiter": "\t", "skipColumns": 1})
    rows = sorted(scan.df.collect(), key=lambda r: r["_row"])
    assert scan.header_titles == ["A", "B"]
    assert [(r["_c0"], r["_c1"]) for r in rows] == [("1", "x"), ("2", "y")]


def test_no_header(spark, tmp_path):
    content = "1,x\n2,y\n"
    scan, _ = _scan(spark, tmp_path, content, {"header": False})
    rows = sorted(scan.df.collect(), key=lambda r: r["_row"])
    assert scan.header_titles == []
    assert [(r["_row"], r["_sourceRow"]) for r in rows] == [(1, 1), (2, 2)]


def test_quoted_fields_with_delimiter(spark, tmp_path):
    content = 'a,b\n"x,y",2\n"he said ""hi""",3\n'
    scan, _ = _scan(spark, tmp_path, content, {})
    rows = sorted(scan.df.collect(), key=lambda r: r["_row"])
    assert rows[0]["_c0"] == "x,y"
    assert rows[1]["_c0"] == 'he said "hi"'


def test_trim_dialect(spark, tmp_path):
    from rdf_tabular_spark.operators.cells import build_cells
    from pyspark.sql import functions as F

    content = "a\n  padded  \n"
    scan, table = _scan(spark, tmp_path, content, {"trim": True},
                        columns=[{"name": "a"}])
    cells = build_cells(scan.df, table)
    v = cells.select(
        F.try_element_at(F.col("cell_a"), F.lit(1))["lex"].alias("v")).collect()
    assert v[0]["v"] == "padded"


def test_multiline_cells(spark, tmp_path):
    """Cells with embedded line terminators route through the multiLine
    record-framing scan; row numbers are record indices (reference: Ruby
    CSV iterates records, so sourceNumbers are record-based there too)."""
    from rdf_tabular_spark.csvw.metadata import parse_metadata
    from rdf_tabular_spark.sources.csv_source import read_table

    p = tmp_path / "ml.csv"
    p.write_text('a,b\n1,"line1\nline2"\n2,plain\n3,"x\ny\nz"\n')
    table = parse_metadata(
        {"url": "http://example.org/ml.csv"},
        base="http://example.org/ml.csv").tables[0]
    scan = read_table(spark, table, str(p))
    assert scan.header_titles == ["a", "b"]
    rows = {r["_c0"]: r for r in scan.df.collect()}
    assert rows["1"]["_c1"] == "line1\nline2"
    assert rows["2"]["_c1"] == "plain"
    assert rows["3"]["_c1"] == "x\ny\nz"
    # record-based numbering: data records 1..3
    assert sorted(r["_row"] for r in rows.values()) == [1, 2, 3]
    assert sorted(r["_sourceRow"] for r in rows.values()) == [2, 3, 4]


def test_multiline_not_triggered_by_balanced_quotes(spark, tmp_path):
    from rdf_tabular_spark.csvw.metadata import parse_metadata
    from rdf_tabular_spark.sources.csv_source import read_table

    p = tmp_path / "q.csv"
    p.write_text('a,b\n1,"quoted, with comma"\n')
    table = parse_metadata(
        {"url": "http://example.org/q.csv"},
        base="http://example.org/q.csv").tables[0]
    scan = read_table(spark, table, str(p))
    assert [r["_c1"] for r in scan.df.collect()] == ["quoted, with comma"]


def test_non_utf8_encoding(spark, tmp_path):
    """S1 dialect `encoding`: ISO-8859-1 input routes through the JVM CSV
    reader, which honors the encoding option."""
    from rdf_tabular_spark.csvw.metadata import parse_metadata
    from rdf_tabular_spark.sources.csv_source import read_table

    p = tmp_path / "latin.csv"
    p.write_bytes("name,city\nJosé,Málaga\nZoë,Zürich\n".encode("iso-8859-1"))
    table = parse_metadata(
        {"url": "http://example.org/latin.csv",
         "dialect": {"encoding": "iso-8859-1"}},
        base="http://example.org/latin.csv").tables[0]
    scan = read_table(spark, table, str(p))
    assert scan.header_titles == ["name", "city"]
    rows = sorted((r["_c0"], r["_c1"]) for r in scan.df.collect())
    assert rows == [("José", "Málaga"), ("Zoë", "Zürich")]


def test_custom_line_terminator(spark, tmp_path):
    """S1 dialect `lineTerminators`: a non-standard record separator routes
    through the JVM reader's lineSep."""
    from rdf_tabular_spark.csvw.metadata import parse_metadata
    from rdf_tabular_spark.sources.csv_source import read_table

    p = tmp_path / "semi.csv"
    p.write_text("a,b;1,x;2,y;")
    table = parse_metadata(
        {"url": "http://example.org/semi.csv",
         "dialect": {"lineTerminators": ";"}},
        base="http://example.org/semi.csv").tables[0]
    scan = read_table(spark, table, str(p))
    assert scan.header_titles == ["a", "b"]
    rows = sorted((r["_c0"], r["_c1"]) for r in scan.df.collect()
                  if r["_c0"] is not None)
    assert rows == [("1", "x"), ("2", "y")]


def test_line_terminators_array_default_is_standard_path(spark, tmp_path):
    """`lineTerminators` is string-or-array; an array equal to the spec
    default must NOT reroute to the record-framing scan (round-1 advice:
    the scalar assumption crashed on any array value)."""
    from rdf_tabular_spark.csvw.metadata import parse_metadata
    from rdf_tabular_spark.sources.csv_source import read_table

    p = tmp_path / "arr.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    table = parse_metadata(
        {"url": "http://example.org/arr.csv",
         "dialect": {"lineTerminators": ["\r\n", "\n"]}},
        base="http://example.org/arr.csv").tables[0]
    assert table.dialect.custom_line_sep is None
    scan = read_table(spark, table, str(p))
    assert scan.header_titles == ["a", "b"]
    assert sorted((r["_c0"], r["_c1"]) for r in scan.df.collect()) == [
        ("1", "x"), ("2", "y")]


def test_multichar_line_terminator(spark, tmp_path):
    """A multi-char custom record separator ('||') exceeds the JVM lineSep
    1-char limit -> driver-side record split, quoted embedded separators
    preserved."""
    from rdf_tabular_spark.csvw.metadata import parse_metadata
    from rdf_tabular_spark.sources.csv_source import read_table

    p = tmp_path / "pipe.csv"
    p.write_text('a,b||1,"x||y"||2,z||')
    table = parse_metadata(
        {"url": "http://example.org/pipe.csv",
         "dialect": {"lineTerminators": "||"}},
        base="http://example.org/pipe.csv").tables[0]
    scan = read_table(spark, table, str(p))
    assert scan.header_titles == ["a", "b"]
    rows = sorted((r["_c0"], r["_c1"]) for r in scan.df.collect())
    assert rows == [("1", "x||y"), ("2", "z")]


def test_unquoted_midfield_quote_stays_on_line_scan(spark, tmp_path):
    """An unquoted quoteChar inside a field (`5" x 4`) must not reroute the
    file to the JVM multiLine parser (round-1 advice: the odd-quote
    heuristic counted every quote; now only field-boundary quotes count)."""
    from rdf_tabular_spark.csvw.metadata import parse_metadata
    from rdf_tabular_spark.sources.csv_source import read_table

    p = tmp_path / "inch.csv"
    p.write_text('name,size\nboard,5" x 4\nplank,7\n')
    table = parse_metadata(
        {"url": "http://example.org/inch.csv"},
        base="http://example.org/inch.csv").tables[0]
    scan = read_table(spark, table, str(p))
    rows = sorted((r["_c0"], r["_c1"], r["_row"]) for r in scan.df.collect())
    assert rows == [("board", '5" x 4', 1), ("plank", "7", 2)]


def test_ragged_rows_surface_as_scan_problems(spark, tmp_path):
    """Record-framing scan: a row wider than the declared schema is a scan
    problem, not a silent truncation."""
    from rdf_tabular_spark.csvw.metadata import parse_metadata
    from rdf_tabular_spark.sources.csv_source import read_table

    p = tmp_path / "ragged.csv"
    p.write_text('a,b\n1,"x\ny",extra,wider\n2,z\n')
    table = parse_metadata(
        {"url": "http://example.org/ragged.csv",
         "tableSchema": {"columns": [{"name": "a"}, {"name": "b"}]}},
        base="http://example.org/ragged.csv").tables[0]
    scan = read_table(spark, table, str(p))
    assert any("ragged" in pr for pr in scan.problems), scan.problems


def test_multiline_probe_cached_per_path(spark, tmp_path):
    """The embedded-terminator probe result is cached per (path, mtime,
    dialect), so repeated reads of the same quoted file (validate +
    to_triples + to_json in one run) pay the extra scan once."""
    from rdf_tabular_spark.csvw.metadata import parse_metadata
    from rdf_tabular_spark.sources import csv_source

    p = tmp_path / "quoted.csv"
    p.write_text('a,b\n1,"x y"\n')
    table = parse_metadata(
        {"url": "http://example.org/quoted.csv"},
        base="http://example.org/quoted.csv").tables[0]
    csv_source._MULTILINE_PROBE_CACHE.clear()
    first = csv_source.read_table(spark, table, str(p))
    assert len(csv_source._MULTILINE_PROBE_CACHE) == 1
    key = next(iter(csv_source._MULTILINE_PROBE_CACHE))
    assert csv_source._MULTILINE_PROBE_CACHE[key] is False
    again = csv_source.read_table(spark, table, str(p))
    assert sorted(map(tuple, again.df.collect())) == \
        sorted(map(tuple, first.df.collect()))
    # touching the file invalidates the cache entry (new mtime, new key)
    import os
    import time

    os.utime(p, (time.time() + 10, time.time() + 10))
    csv_source.read_table(spark, table, str(p))
    assert len(csv_source._MULTILINE_PROBE_CACHE) == 2


def test_scan_lines_df_matches_single_file_scan(spark, tmp_path):
    """Cross-validation: the distributed MANY-file dialect scan
    (scan_lines_df) and the single-file scan (read_table) implement the
    same S2-S5 semantics — same surviving rows, numbering, and semantic
    cell values — across randomized dialects and quote-free content.
    Normalization for the compare: read_table emits raw cells (trimming
    and ''->null happen later in the cell pipeline, operators/cells.py),
    scan_lines_df applies trim at the scan; both converge to
    trim(cell) or NULL."""
    import random

    from rdf_tabular_spark.csvw.metadata import parse_metadata
    from rdf_tabular_spark.sources.csv_source import read_table, scan_lines_df

    def norm(v):
        if v is None:
            return None
        return v.strip() or None

    for seed in range(10):
        rng = random.Random(seed)
        delim = rng.choice([",", ";"])
        skip_rows = rng.randint(0, 2)
        skip_cols = rng.randint(0, 1)
        blank = rng.choice([True, False])
        n_phys = 3 + skip_cols

        def cell(r):
            return r.choice(["", "x", "ab c", " pad ", "1.5", "zz"])

        lines = [f"junk skipped {i}" for i in range(skip_rows)]
        lines.append(delim.join(f"h{i}" for i in range(n_phys)))
        for _ in range(12):
            kind = rng.random()
            if kind < 0.15:
                lines.append("# a comment " + str(rng.randint(0, 9)))
            elif kind < 0.3:
                lines.append(rng.choice(["", "   ", delim * (n_phys - 1)]))
            else:
                lines.append(delim.join(cell(rng) for _ in range(n_phys)))

        p = tmp_path / f"rand{seed}.csv"
        p.write_text("\n".join(lines) + "\n")
        meta = {
            "url": f"http://example.org/rand{seed}.csv",
            "dialect": {"delimiter": delim, "skipRows": skip_rows,
                        "skipColumns": skip_cols, "commentPrefix": "#",
                        "skipBlankRows": blank},
            "tableSchema": {"columns": [
                {"name": f"c{i}"} for i in range(n_phys - skip_cols)]},
        }
        table = parse_metadata(meta, base=meta["url"]).tables[0]
        single = read_table(spark, table, str(p))
        want = sorted(
            (r["_row"],) + tuple(norm(r[f"_c{i}"])
                                 for i in range(n_phys - skip_cols))
            for r in single.df.collect())

        staged = spark.createDataFrame(
            [(0, i + 1, ln) for i, ln in enumerate(lines)],
            "file_id long, line_no long, text string")
        multi = scan_lines_df(staged, table.dialect, n_phys)
        got = sorted(
            (r["_row"],) + tuple(norm(r[f"_c{i}"])
                                 for i in range(n_phys - skip_cols))
            for r in multi.collect())
        assert got == want, (seed, got, want)


def test_fully_quoted_adjacent_fields_route_to_multiline(spark, tmp_path):
    """'"a","b<NL>c","d"' — non-overlapping boundary matches consume the
    shared comma and count even, which misrouted this file to the line
    scan (round-2 review finding); the combined parity+boundary probe
    routes it to record framing and parses the embedded newline."""
    from rdf_tabular_spark.csvw.metadata import parse_metadata
    from rdf_tabular_spark.sources.csv_source import read_table

    p = tmp_path / "adj.csv"
    p.write_text('"h1","h2","h3"\n"a","b\nc","d"\n"e","f","g"\n')
    table = parse_metadata(
        {"url": "http://example.org/adj.csv"},
        base="http://example.org/adj.csv").tables[0]
    scan = read_table(spark, table, str(p))
    rows = sorted((r["_c0"], r["_c1"], r["_c2"]) for r in scan.df.collect())
    assert rows == [("a", "b\nc", "d"), ("e", "f", "g")]


def test_fully_quoted_simple_file_stays_on_line_scan(spark, tmp_path):
    """A fully-quoted file WITHOUT embedded newlines has even per-line
    quote counts and must stay on the distributed line scan (the
    boundary-only probe misrouted every such file through the
    driver-heavy multiline path)."""
    from rdf_tabular_spark.csvw.metadata import parse_metadata
    from rdf_tabular_spark.sources import csv_source

    p = tmp_path / "fq.csv"
    p.write_text('"h1","h2"\n"x","y"\n"z","w"\n')
    table = parse_metadata(
        {"url": "http://example.org/fq.csv"},
        base="http://example.org/fq.csv").tables[0]
    csv_source._MULTILINE_PROBE_CACHE.clear()
    scan = csv_source.read_table(spark, table, str(p))
    assert list(csv_source._MULTILINE_PROBE_CACHE.values()) == [False]
    rows = sorted((r["_c0"], r["_c1"]) for r in scan.df.collect())
    assert rows == [("x", "y"), ("z", "w")]


def test_multiple_line_terminators_all_split(spark, tmp_path):
    """CSVW lineTerminators is a LIST: every listed terminator ends a row.
    ['\\n', ';'] must split on both (the first-custom-only handling
    merged newline-terminated records)."""
    from rdf_tabular_spark.csvw.metadata import parse_metadata
    from rdf_tabular_spark.sources.csv_source import read_table

    p = tmp_path / "mix.csv"
    p.write_text("a,b\n1,x;2,y\n3,z;")
    table = parse_metadata(
        {"url": "http://example.org/mix.csv",
         "dialect": {"lineTerminators": ["\n", ";"]}},
        base="http://example.org/mix.csv").tables[0]
    scan = read_table(spark, table, str(p))
    assert scan.header_titles == ["a", "b"]
    rows = sorted((r["_c0"], r["_c1"]) for r in scan.df.collect()
                  if r["_c0"] is not None)
    assert rows == [("1", "x"), ("2", "y"), ("3", "z")]


def test_ragged_detection_ignores_comment_and_header_rows(spark, tmp_path):
    """Raggedness is a data-row problem: a wide comment line or skipped
    title row must not be reported (round-2 review finding)."""
    from rdf_tabular_spark.csvw.metadata import parse_metadata
    from rdf_tabular_spark.sources.csv_source import read_table

    p = tmp_path / "cw.csv"
    p.write_text('# note, with, many, commas, here\na,b\n1,"x\ny"\n2,z\n')
    table = parse_metadata(
        {"url": "http://example.org/cw.csv",
         "dialect": {"skipRows": 1, "commentPrefix": "#"},
         "tableSchema": {"columns": [{"name": "a"}, {"name": "b"}]}},
        base="http://example.org/cw.csv").tables[0]
    scan = read_table(spark, table, str(p))
    assert scan.problems == [], scan.problems


def test_utf8_bom_stripped_from_header(spark, tmp_path):
    """A UTF-8 BOM before the header must not leak into the first column
    title (Ruby's CSV reads bom|utf-8; our text scan strips it too)."""
    p = tmp_path / "bom.csv"
    p.write_bytes(b"\xef\xbb\xbfname,age\nann,3\n")
    from rdf_tabular_spark.csvw.metadata import parse_metadata
    from rdf_tabular_spark.sources.csv_source import read_table

    table = parse_metadata({"url": "http://example.org/bom.csv"},
                           base="http://example.org/bom.csv").tables[0]
    scan = read_table(spark, table, str(p))
    assert scan.header_titles == ["name", "age"]
    assert [(r["_c0"], r["_c1"]) for r in scan.df.collect()] == [("ann", "3")]


def test_comment_collect_is_bounded(spark, tmp_path, monkeypatch):
    """VERDICT r4 #4: a file that is mostly commentPrefix lines must not
    materialize an unbounded comment list on the driver. The collect is
    an ordered limit (TakeOrderedAndProject — each task keeps at most
    cap rows), comments truncate to the cap IN SOURCE ORDER with a
    warning, and the data rows are untouched."""
    import warnings

    from rdf_tabular_spark.sources import csv_source

    monkeypatch.setattr(csv_source, "_COMMENT_CAP", 5)
    body = "".join(f"#c{i}\n1,x\n" for i in range(20))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        scan, _ = _scan(spark, tmp_path, "a,b\n" + body,
                        {"commentPrefix": "#"})
    assert scan.comments == [f"c{i}" for i in range(5)]  # first 5, ordered
    assert any("truncated" in str(x.message) for x in w)
    assert scan.df.count() == 20  # every data row survives


def test_comment_collect_plan_is_top_k(spark, tmp_path):
    """The ordered-limit shape actually compiles to
    TakeOrderedAndProject in the physical plan (not a global Sort +
    Collect): assert on the plan of the same expression the scan
    builds."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    # cap (5) below the row count so the top-K survives optimization —
    # with cap >= |rows| Catalyst rightly folds the limit away, which is
    # also bounded; the interesting case is cap << rows
    df = spark.range(100).select(
        F.col("id").alias("_sourceRow"),
        F.concat(F.lit("#c"), F.col("id")).alias("value"))
    limited = df.orderBy("_sourceRow").limit(5 + 1)
    buf = io.StringIO()
    with redirect_stdout(buf):
        limited.explain()
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # no shuffle: per-task heaps + driver merge
