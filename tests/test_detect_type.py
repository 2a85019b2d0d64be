"""Metadata type-dispatch table, ported from the reference's "intuits
subclass" spec (metadata_spec.rb:833-882; dispatch metadata.rb:276-297).
Driver-side only."""

from __future__ import annotations

import pytest

from rdf_tabular_spark.csvw.metadata import detect_type

CASES = [
    ({"@type": "TableGroup"}, "TableGroup"),
    ({"@type": "Table"}, "Table"),
    ({"@type": "Template"}, "Transformation"),
    ({"@type": "Schema"}, "Schema"),
    ({"@type": "Column"}, "Column"),
    ({"@type": "Dialect"}, "Dialect"),
    ({"tables": []}, "TableGroup"),
    ({"dialect": {}}, "Table"),
    ({"tableSchema": {}}, "Table"),
    ({"transformations": []}, "Table"),
    ({"targetFormat": "http://foo"}, "Transformation"),
    ({"scriptFormat": "http://foo"}, "Transformation"),
    ({"source": "json"}, "Transformation"),
    ({"columns": []}, "Schema"),
    ({"primaryKey": "foo"}, "Schema"),
    ({"foreignKeys": []}, "Schema"),
    ({"rowTitles": "foo"}, "Schema"),
    ({"name": "c"}, "Column"),
    ({"virtual": True}, "Column"),
    ({"commentPrefix": "#"}, "Dialect"),
    ({"delimiter": ","}, "Dialect"),
    ({"doubleQuote": True}, "Dialect"),
    ({"encoding": "utf-8"}, "Dialect"),
    ({"header": True}, "Dialect"),
    ({"headerRowCount": 1}, "Dialect"),
    ({"lineTerminators": "\r\n"}, "Dialect"),
    ({"quoteChar": '"'}, "Dialect"),
    ({"skipBlankRows": True}, "Dialect"),
    ({"skipColumns": 0}, "Dialect"),
    ({"skipInitialSpace": True}, "Dialect"),
    ({"skipRows": 1}, "Dialect"),
    ({"trim": True}, "Dialect"),
    # untyped empty document -> TableGroup (metadata.rb:288)
    ({}, "TableGroup"),
    # our url-only shorthand (reader for_input wraps the same way)
    ({"url": "http://example.org/t.csv"}, "Table"),
]


@pytest.mark.parametrize("doc,expected", CASES,
                         ids=[f"{list(d) or ['empty']}->{e}" for d, e in CASES])
def test_detect_type(doc, expected):
    assert detect_type(doc) == expected
