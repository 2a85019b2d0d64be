"""Metadata-document validation, ported from the reference's Schema /
foreignKeys / facet validity specs (metadata_spec.rb:305-480; facet rules
metadata.rb:719-770). Driver-side only — no Spark session."""

from __future__ import annotations

import pytest

from rdf_tabular_spark.csvw.metadata import validate_document

BASE = "http://example.org/base"


def _schema_doc(schema: dict) -> dict:
    return {"url": "http://example.org/t.csv", "tableSchema": schema}


# ---- Schema.columns (metadata_spec.rb:305-330) ---------------------------


def test_valid_column():
    errors, warnings = validate_document(
        _schema_doc({"columns": [{"name": "foo"}]}), base=BASE)
    assert errors == [] and warnings == []


def test_invalid_column_name_warns():
    errors, warnings = validate_document(
        _schema_doc({"columns": [{"name": "_invalid"}]}), base=BASE)
    assert errors == []
    assert any("invalid syntax" in w for w in warnings)


def test_duplicate_column_names_error():
    errors, _ = validate_document(
        _schema_doc({"columns": [{"name": "foo"}, {"name": "foo"}]}), base=BASE)
    assert any("not unique" in e for e in errors)


def test_virtual_before_nonvirtual_error():
    errors, _ = validate_document(
        _schema_doc({"columns": [{"name": "v", "virtual": True},
                                 {"name": "foo"}]}), base=BASE)
    assert any("virtual" in e for e in errors)


# ---- Schema.primaryKey (metadata_spec.rb:332-366) ------------------------


def test_primary_key_ok():
    errors, warnings = validate_document(
        _schema_doc({"columns": [{"name": "foo"}, {"name": "bar"}],
                     "primaryKey": ["foo", "bar"]}), base=BASE)
    assert errors == [] and warnings == []


def test_primary_key_missing_column_warns():
    errors, warnings = validate_document(
        _schema_doc({"columns": [{"name": "foo"}],
                     "primaryKey": ["foo", "bar"]}), base=BASE)
    assert errors == []
    assert any("primaryKey" in w for w in warnings)


# ---- foreignKeys (metadata_spec.rb:368-478) ------------------------------


def _fk_group(fk: dict) -> dict:
    return {
        "@context": "http://www.w3.org/ns/csvw",
        "tables": [
            {"url": "a", "tableSchema": {
                "@id": "a_s",
                "columns": [{"name": "a1"}, {"name": "a2"}],
                "foreignKeys": [fk]}},
            {"url": "b", "tableSchema": {
                "@id": "b_s",
                "columns": [{"name": "b1"}, {"name": "b2"}]}},
        ],
    }


VALID_FKS = {
    "single column with resource": {
        "columnReference": "a1",
        "reference": {"resource": "b", "columnReference": "b1"}},
    "multiple columns with resource": {
        "columnReference": ["a1", "a2"],
        "reference": {"resource": "b", "columnReference": ["b1", "b2"]}},
    "single column with schemaReference": {
        "columnReference": "a1",
        "reference": {"schemaReference": "b_s", "columnReference": "b1"}},
}

INVALID_FKS = {
    "missing source column": {
        "columnReference": "not_here",
        "reference": {"resource": "b", "columnReference": "b1"}},
    "one missing source column": {
        "columnReference": ["a1", "not_here"],
        "reference": {"resource": "b", "columnReference": ["b1", "b2"]}},
    "missing destination column": {
        "columnReference": "a1",
        "reference": {"resource": "b", "columnReference": "not_there"}},
    "missing resource": {
        "columnReference": "a1",
        "reference": {"resource": "not_here", "columnReference": "b1"}},
    "missing tableSchema": {
        "columnReference": "a1",
        "reference": {"schemaReference": "not_here", "columnReference": "b1"}},
    "both resource and tableSchema": {
        "columnReference": "a1",
        "reference": {"resource": "b", "schemaReference": "b_s",
                      "columnReference": "b1"}},
}


@pytest.mark.parametrize("name", list(VALID_FKS))
def test_valid_foreign_keys(name):
    errors, warnings = validate_document(_fk_group(VALID_FKS[name]), base=BASE)
    assert errors == [] and warnings == [], (errors, warnings)


@pytest.mark.parametrize("name", list(INVALID_FKS))
def test_invalid_foreign_keys(name):
    errors, _ = validate_document(_fk_group(INVALID_FKS[name]), base=BASE)
    assert errors, f"{name}: expected errors"


# ---- datatype facet combinations (metadata.rb:719-770) -------------------


@pytest.mark.parametrize("dt,frag", [
    ({"base": "string", "length": 2, "minLength": 3}, "length < minLength"),
    ({"base": "string", "length": 5, "maxLength": 3}, "length > maxLength"),
    ({"base": "string", "minLength": 5, "maxLength": 3}, "minLength > maxLength"),
    ({"base": "integer", "length": 3}, "length facets"),
    ({"base": "string", "minimum": 1}, "range facets"),
    ({"base": "integer", "minInclusive": 1, "minExclusive": 0},
     "both minInclusive and minExclusive"),
    ({"base": "integer", "maxInclusive": 1, "maxExclusive": 2},
     "both maxInclusive and maxExclusive"),
    ({"base": "integer", "minInclusive": 5, "maxInclusive": 3},
     "maxInclusive < minInclusive"),
    ({"base": "integer", "minInclusive": 5, "maxExclusive": 5},
     "maxExclusive <= minInclusive"),
    ({"base": "integer", "minExclusive": 5, "maxInclusive": 5},
     "maxInclusive <= minExclusive"),
])
def test_facet_combination_errors(dt, frag):
    errors, _ = validate_document(
        _schema_doc({"columns": [{"name": "c", "datatype": dt}]}), base=BASE)
    assert any(frag in e for e in errors), (frag, errors)


@pytest.mark.parametrize("dt", [
    {"base": "string", "length": 3, "minLength": 3, "maxLength": 3},
    {"base": "integer", "minInclusive": 1, "maxInclusive": 10},
    {"base": "date", "minInclusive": "2000-01-01", "maxExclusive": "2020-01-01"},
    {"base": "hexBinary", "maxLength": 4},
])
def test_valid_facet_combinations(dt):
    errors, _ = validate_document(
        _schema_doc({"columns": [{"name": "c", "datatype": dt}]}), base=BASE)
    assert errors == [], errors


def test_unsupported_datatype_warns():
    errors, warnings = validate_document(
        _schema_doc({"columns": [{"name": "c", "datatype": "IDREFS"}]}),
        base=BASE)
    assert errors == []
    assert any("unsupported datatype" in w for w in warnings)
