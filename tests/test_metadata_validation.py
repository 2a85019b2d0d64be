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


# ---- sanitization: warn-and-ignore property values (normalize.py, ----
# ---- reference set_property metadata.rb:1203-1219) -----------------------


from rdf_tabular_spark.csvw.normalize import sanitize_metadata


def test_invalid_inherited_values_act_unset():
    doc = _schema_doc({"columns": [
        {"name": "c", "null": 1, "ordered": "yes", "required": "yes",
         "lang": "not a tag!", "textDirection": "up", "default": 5,
         "separator": 7}]})
    clean, warnings, errors = sanitize_metadata(doc, base=BASE)
    col = clean["tableSchema"]["columns"][0]
    assert set(col) == {"name"}
    assert len(warnings) == 7 and errors == []


def test_invalid_dialect_values_act_unset():
    doc = {"url": "t.csv", "dialect": {
        "delimiter": True, "header": "yes", "headerRowCount": "1",
        "skipRows": -1, "encoding": "no-such-enc", "trim": 1,
        "skipBlankRows": "no", "doubleQuote": "maybe", "quoteChar": 3,
        "lineTerminators": False, "skipColumns": True}}
    clean, warnings, errors = sanitize_metadata(doc, base=BASE)
    assert clean["dialect"] == {}
    assert len(warnings) == 11 and errors == []


def test_dialect_null_quote_and_comment_prefix_kept():
    doc = {"url": "t.csv",
           "dialect": {"quoteChar": None, "commentPrefix": None}}
    clean, warnings, _ = sanitize_metadata(doc, base=BASE)
    assert clean["dialect"] == {"quoteChar": None, "commentPrefix": None}
    assert warnings == []


def test_bnode_id_is_error():
    _, _, errors = sanitize_metadata({"url": "t.csv", "@id": "_:t"}, BASE)
    assert any("_:" in e for e in errors)


def test_wrong_at_type_is_error():
    _, _, errors = sanitize_metadata(
        {"url": "t.csv", "@type": "Tabel", "tableSchema": {}}, BASE)
    assert any("@type" in e for e in errors)


def test_empty_tables_is_error():
    _, _, errors = sanitize_metadata({"tables": []}, BASE)
    assert any("tables" in e for e in errors)


def test_table_missing_url_is_error():
    _, _, errors = sanitize_metadata(
        {"tables": [{"tableSchema": {"columns": []}}]}, BASE)
    assert any("url" in e for e in errors)


def test_unexpected_key_warns():
    _, warnings, _ = sanitize_metadata(
        {"url": "t.csv", "rowTitle": "x"}, BASE)
    assert any("unexpected" in w for w in warnings)


def test_titles_cleanup():
    doc = _schema_doc({"columns": [
        {"name": "c", "titles": {"en": "C", "12!bad": "X"}},
        {"name": "d", "titles": ["D", 7]}]})
    clean, warnings, _ = sanitize_metadata(doc, BASE)
    cols = clean["tableSchema"]["columns"]
    assert cols[0]["titles"] == {"en": ["C"]}
    assert cols[1]["titles"] == ["D"]
    assert len(warnings) == 2


def test_nonarray_columns_warn_to_empty():
    clean, warnings, _ = sanitize_metadata(
        _schema_doc({"columns": "nope"}), BASE)
    assert clean["tableSchema"]["columns"] == []
    assert any("columns" in w for w in warnings)


def test_invalid_context_language_warns_and_ignored():
    doc = {"@context": ["http://www.w3.org/ns/csvw", {"@language": "x!"}],
           "url": "t.csv"}
    clean, warnings, _ = sanitize_metadata(doc, BASE)
    assert "@language" not in clean["@context"][1]
    assert any("@language" in w for w in warnings)


@pytest.mark.parametrize("value,frag", [
    ({"@value": "T", "@language": "en", "@type": "xsd:string"},
     "both @type and @language"),
    ({"@value": "T", "@id": "x"}, "may not contain keys"),
    ({"@list": ["a"]}, "invalid use of '@list'"),
    ({"@id": "_:me"}, "BNode"),
    ({"@id": "http://e.org/x", "@type": 5}, "invalid type"),
    ({"@value": "T", "@language": "99!"}, "@language"),
])
def test_common_property_jsonld_errors(value, frag):
    _, _, errors = sanitize_metadata(
        {"url": "t.csv", "dc:title": value}, BASE)
    assert any(frag in e for e in errors), (frag, errors)


def test_common_property_valid_forms_pass():
    doc = {"url": "t.csv",
           "dc:title": {"@value": "T", "@language": "en"},
           "dc:creator": {"@id": "http://e.org/me",
                          "@type": "schema:Person",
                          "schema:name": "N"},
           "dc:subject": ["a", {"@value": "b", "@type": "xsd:string"}]}
    _, warnings, errors = sanitize_metadata(doc, BASE)
    assert errors == [] and warnings == []


def test_builtin_datatype_id_is_error():
    _, _, errors = sanitize_metadata(_schema_doc({"columns": [
        {"name": "c", "datatype": {
            "base": "integer",
            "@id": "http://www.w3.org/2001/XMLSchema#integer"}}]}), BASE)
    assert any("built-in" in e for e in errors)


def test_transformation_checks():
    doc = {"url": "t.csv", "transformations": [
        {"@type": "Template", "url": "t.xsl",
         "targetFormat": "http://e.org/f",
         "scriptFormat": "http://e.org/s", "source": "json"},
        "junk"]}
    clean, warnings, errors = sanitize_metadata(doc, BASE)
    assert len(clean["transformations"]) == 1
    assert any("transformations" in w for w in warnings)
    assert errors == []
    _, _, errors2 = sanitize_metadata(
        {"url": "t.csv", "transformations": [
            {"@type": "Template", "url": "t.xsl",
             "scriptFormat": "http://e.org/s"}]}, BASE)
    assert any("targetFormat" in e for e in errors2)


def test_context_base_resolves_urls():
    from rdf_tabular_spark.csvw.metadata import parse_metadata

    doc = {"@context": ["http://www.w3.org/ns/csvw",
                        {"@base": "sub/"}],
           "url": "t.csv", "tableSchema": {"columns": [
               {"name": "a", "titles": "a"}]}}
    g = parse_metadata(doc, base="http://e.org/meta.json")
    assert g.tables[0].url == "http://e.org/sub/t.csv"


def test_context_extra_key_is_error():
    from rdf_tabular_spark.csvw.normalize import sanitize_metadata

    doc = {"@context": ["http://www.w3.org/ns/csvw",
                        {"@vocab": "http://e.org/v#"}],
           "url": "t.csv"}
    _, _w, errors = sanitize_metadata(doc, "http://e.org/meta.json")
    assert any("other than @base and @language" in e for e in errors)


def test_context_invalid_base_warns_and_ignored():
    from rdf_tabular_spark.csvw.metadata import parse_metadata
    from rdf_tabular_spark.csvw.normalize import sanitize_metadata

    doc = {"@context": ["http://www.w3.org/ns/csvw", {"@base": 7}],
           "url": "t.csv"}
    clean, warns, errors = sanitize_metadata(doc, "http://e.org/m.json")
    assert any("invalid @base" in w for w in warns) and not errors
    g = parse_metadata(doc, base="http://e.org/m.json")
    assert g.tables[0].url == "http://e.org/t.csv"
