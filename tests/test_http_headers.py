"""HTTP response-header dialect overrides (reference reader.rb:113-132,
tested there at reader_spec.rb:53-83).

The reference's tests mock the dialect and assert the setter calls; here
each override is exercised end-to-end through ``to_triples`` on a real
file, which also pins what the override *does* to the output."""

from __future__ import annotations

import pytest

from rdf_tabular_spark.csvw.http_headers import (
    apply_http_headers,
    header_language,
    parse_content_type,
)
from rdf_tabular_spark.csvw.metadata import Dialect
from rdf_tabular_spark.reader import to_triples


def test_parse_content_type():
    mime, params = parse_content_type('text/csv; charset="UTF-8"; header=absent')
    assert mime == "text/csv"
    assert params == {"charset": "UTF-8", "header": "absent"}
    assert parse_content_type("TEXT/TSV") == ("text/tsv", {})


def test_apply_overrides_pure():
    d = Dialect()
    # text/tsv -> tab separator (reader.rb:116)
    assert apply_http_headers(d, {"Content-Type": "text/tsv"}).delimiter == "\t"
    # header=absent -> header off (reader.rb:114)
    d2 = apply_http_headers(d, {"content_type": "text/csv;header=absent"})
    assert d2.header is False and d2.delimiter == ","
    # charset -> encoding (reader.rb:115)
    d3 = apply_http_headers(d, {"Content-Type": "text/csv;charset=ISO-8859-4"})
    assert d3.encoding == "ISO-8859-4"
    # no content type -> untouched instance
    assert apply_http_headers(d, {"X-Other": "1"}) is d
    # header param with a non-absent value is not an override
    assert apply_http_headers(
        d, {"Content-Type": "text/csv;header=present"}).header is True


def test_header_language_single_vs_multiple():
    assert header_language({"Content-Language": "de"}) == "de"
    # multiple languages are ignored (reader.rb:128-129)
    assert header_language({"Content-Language": "de, en"}) is None
    assert header_language({}) is None


@pytest.fixture()
def tsv_file(tmp_path):
    p = tmp_path / "data.txt"  # extension deliberately not .tsv
    p.write_text("name\tage\nann\t3\n", encoding="utf-8")
    return str(p)


def _triples(spark, path, headers, metadata=None):
    md = metadata or {"@context": "http://www.w3.org/ns/csvw",
                      "url": "http://example.org/data"}
    return to_triples(
        spark, md, base="http://example.org/data",
        url_map={"http://example.org/data": path},
        headers=headers).triples.collect()


def test_tsv_content_type_sets_tab_delimiter(spark, tsv_file):
    rows = _triples(spark, tsv_file, {"Content-Type": "text/tsv"})
    by_pred = {r["pred"].rsplit("#", 1)[-1]: r["obj"] for r in rows}
    assert by_pred == {"name": "ann", "age": "3"}


def test_header_absent_makes_first_line_data(spark, tsv_file):
    rows = _triples(spark, tsv_file,
                    {"Content-Type": "text/tsv;header=absent"})
    # two data rows, default _col.N names percent-encoded in predicates
    objs = sorted(r["obj"] for r in rows)
    assert objs == ["3", "age", "ann", "name"]


def test_charset_override_decodes_latin1(spark, tmp_path):
    p = tmp_path / "latin.csv"
    p.write_bytes("name\ncafé\n".encode("iso-8859-1"))
    rows = _triples(spark, str(p),
                    {"Content-Type": "text/csv;charset=ISO-8859-1"})
    assert [r["obj"] for r in rows] == ["café"]


def test_content_language_tags_untyped_literals(spark, tsv_file):
    rows = _triples(spark, tsv_file,
                    {"Content-Type": "text/tsv", "Content-Language": "de"})
    assert {r["obj_lang"] for r in rows} == {"de"}
    # ...but an explicit column lang wins over the header default
    md = {"@context": "http://www.w3.org/ns/csvw",
          "url": "http://example.org/data",
          "tableSchema": {"columns": [
              {"titles": "name", "lang": "en"},
              {"titles": "age"}]}}
    rows = _triples(spark, tsv_file,
                    {"Content-Type": "text/tsv", "Content-Language": "de"},
                    metadata=md)
    langs = {r["pred"].rsplit("#", 1)[-1]: r["obj_lang"] for r in rows}
    assert langs == {"name": "en", "age": "de"}


def test_multi_language_header_leaves_literals_untagged(spark, tsv_file):
    rows = _triples(spark, tsv_file,
                    {"Content-Type": "text/tsv",
                     "Content-Language": "de, en"})
    assert {r["obj_lang"] for r in rows} == {None}
