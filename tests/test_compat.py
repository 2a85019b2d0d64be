"""Schema compatibility checking, ported case-for-case from the
reference's ``#verify_compatible!`` spec table (metadata_spec.rb:1570-1764)
plus the ``verify_compatible!`` semantics at metadata.rb:996-1079.

All driver-side (no Spark session needed): compatibility is a metadata
operation that runs before any executor work.
"""

from __future__ import annotations

import pytest

from rdf_tabular_spark.csvw.metadata import (
    CompatibilityError,
    detect_type,
    parse_metadata,
    verify_compatible,
)

CTX = "http://www.w3.org/ns/csvw"
BASE = "http://example.org/base"

# (name, A-doc, B-doc, compatible?) — verbatim from the reference table
CASES = [
    ("two tables with same id",
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table",
      "tableSchema": {"columns": []}},
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table",
      "tableSchema": {"columns": []}},
     True),
    ("two tables with different id",
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table1",
      "tableSchema": {"columns": []}},
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table2",
      "tableSchema": {"columns": []}},
     False),
    ("table-group and table with same url",
     {"@context": CTX, "@type": "TableGroup", "tables": [
         {"@type": "Table", "url": "http://example.org/table1",
          "tableSchema": {"columns": []}}]},
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table1",
      "tableSchema": {"columns": []}},
     True),
    ("table-group and table with different url",
     {"@context": CTX, "@type": "TableGroup", "tables": [
         {"@type": "Table", "url": "http://example.org/table1",
          "tableSchema": {"columns": []}}]},
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table2",
      "tableSchema": {"columns": []}},
     False),
    ("table-group with two tables",
     {"@context": CTX, "@type": "TableGroup", "tables": [
         {"@type": "Table", "url": "http://example.org/table1",
          "tableSchema": {"columns": []}},
         {"@type": "Table", "url": "http://example.org/table2",
          "tableSchema": {"columns": []}}]},
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table2",
      "tableSchema": {"columns": []}},
     True),
    ("tables with matching columns",
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table1",
      "tableSchema": {"columns": [{"name": "foo"}]}},
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table1",
      "tableSchema": {"columns": [{"name": "foo"}]}},
     True),
    ("tables with virtual columns otherwise matching",
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table1",
      "tableSchema": {"columns": [{"name": "foo"},
                                  {"name": "v", "virtual": True}]}},
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table1",
      "tableSchema": {"columns": [{"name": "foo"}]}},
     True),
    ("tables with differing columns",
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table1",
      "tableSchema": {"columns": [{"name": "foo"}]}},
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table1",
      "tableSchema": {"columns": [{"name": "bar"}]}},
     False),
    ("tables with different column count",
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table1",
      "tableSchema": {"columns": [{"name": "foo"}, {"name": "bar"}]}},
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table1",
      "tableSchema": {"columns": [{"name": "bar"}]}},
     False),
    ("tables with matching columns on name/titles",
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table1",
      "tableSchema": {"columns": [{"name": "foo"}]}},
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table1",
      "tableSchema": {"columns": [{"titles": "foo"}]}},
     False),
    ("tables with mismatch columns on name/titles",
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table1",
      "tableSchema": {"columns": [{"name": "foo"}]}},
     {"@context": CTX, "@type": "Table", "url": "http://example.org/table1",
      "tableSchema": {"columns": [{"titles": "bar"}]}},
     False),
]


def _compile(doc):
    group = parse_metadata(doc, base=BASE)
    if detect_type(doc) == "Table":
        return group.tables[0]
    return group


@pytest.mark.parametrize(
    "name,a_doc,b_doc,compatible", CASES, ids=[c[0] for c in CASES])
def test_verify_compatible(name, a_doc, b_doc, compatible):
    a = _compile(a_doc)
    b_group = parse_metadata(b_doc, base=BASE)
    b = b_group.tables[0]
    if compatible:
        assert verify_compatible(a, b, validate=True) == []
    else:
        with pytest.raises(CompatibilityError):
            verify_compatible(a, b, validate=True)


@pytest.mark.parametrize(
    "name,a_doc,b_doc,compatible", CASES, ids=[c[0] for c in CASES])
def test_verify_compatible_nonvalidating_warns(name, a_doc, b_doc, compatible):
    """Non-validating mode: incompatibilities become warnings, EXCEPT two
    declared names that differ, which error in both modes
    (metadata.rb:1043-1044)."""
    a = _compile(a_doc)
    b = parse_metadata(b_doc, base=BASE).tables[0]
    # declared-name vs declared-name mismatch raises in both modes; the
    # count-mismatch case reaches the same name comparison (foo vs bar)
    raises_always = name in (
        "tables with differing columns", "tables with different column count")
    if raises_always:
        with pytest.raises(CompatibilityError):
            verify_compatible(a, b, validate=False)
        return
    warnings = verify_compatible(a, b, validate=False)
    # name-only vs titles-only columns are checked in validating mode only
    # (metadata.rb:1047 `@options[:validate] || !ta.empty? && !tb.empty?`)
    passes_silently = compatible or name in (
        "tables with matching columns on name/titles",
        "tables with mismatch columns on name/titles")
    if passes_silently:
        assert warnings == []
    else:
        assert warnings, f"{name}: expected warnings in non-validating mode"


def test_titles_language_prefix_fallback():
    """'en' titles match 'en-US' titles with a shared value
    (metadata.rb:1058-1063)."""
    a = _compile({
        "@context": CTX, "@type": "Table", "url": "http://example.org/t",
        "tableSchema": {"columns": [{"titles": {"en": ["foo"]}}]}})
    b_ok = parse_metadata({
        "@context": CTX, "@type": "Table", "url": "http://example.org/t",
        "tableSchema": {"columns": [{"titles": {"en-US": ["foo"]}}]}},
        base=BASE).tables[0]
    assert verify_compatible(a, b_ok, validate=True) == []
    b_bad = parse_metadata({
        "@context": CTX, "@type": "Table", "url": "http://example.org/t",
        "tableSchema": {"columns": [{"titles": {"de": ["foo"]}}]}},
        base=BASE).tables[0]
    with pytest.raises(CompatibilityError):
        verify_compatible(a, b_bad, validate=True)


def test_und_titles_match_any_language():
    a = _compile({
        "@context": CTX, "@type": "Table", "url": "http://example.org/t",
        "tableSchema": {"columns": [{"titles": "foo"}]}})  # und
    b = parse_metadata({
        "@context": CTX, "@type": "Table", "url": "http://example.org/t",
        "tableSchema": {"columns": [{"titles": {"fr": ["foo"]}}]}},
        base=BASE).tables[0]
    assert verify_compatible(a, b, validate=True) == []


def test_empty_embedded_columns_always_compatible():
    """No header -> no column definitions -> compatible (metadata.rb:1020)."""
    a = _compile({
        "@context": CTX, "@type": "Table", "url": "http://example.org/t",
        "tableSchema": {"columns": [{"name": "foo"}, {"name": "bar"}]}})
    b = parse_metadata({
        "@context": CTX, "@type": "Table", "url": "http://example.org/t",
        "tableSchema": {"columns": []}}, base=BASE).tables[0]
    assert verify_compatible(a, b, validate=True) == []
