"""S7: HTML table scan + ``application/csvm+json`` metadata extraction.

Reference behavior: table data comes from ``<td>`` cells with ``<th>`` rows
as titles, located by the url fragment (metadata.rb:851-873, 1809-1842);
an embedded ``<script type="application/csvm+json">`` block supplies the
CSVW metadata (reader.rb:94-107).

HTML sources are human-page-sized documents, so parsing happens on the
driver with the stdlib parser and the rows enter Spark through the
in-memory input path (:func:`..sources.csv_source.inline_table`, S13) —
the 10^12-file KG path never carries HTML.
"""

from __future__ import annotations

import json
from html.parser import HTMLParser


class _HTMLDoc(HTMLParser):
    """Collect per-table cell text and csvm+json script blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[dict] = []  # {"id": str|None, "rows": [[(tag,text)]]}
        self.scripts: list[str] = []
        self._table: dict | None = None
        self._row: list | None = None
        self._cell_tag: str | None = None
        self._cell_text: list[str] = []
        self._in_csvm_script = False

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "table":
            self._table = {"id": a.get("id"), "rows": []}
        elif tag == "tr" and self._table is not None:
            self._row = []
        elif tag in ("th", "td") and self._row is not None:
            self._cell_tag = tag
            self._cell_text = []
        elif tag == "script" and a.get("type") == "application/csvm+json":
            self._in_csvm_script = True
            self._cell_text = []

    def handle_endtag(self, tag):
        if tag in ("th", "td") and self._cell_tag:
            self._row.append((self._cell_tag, "".join(self._cell_text).strip()))
            self._cell_tag = None
        elif tag == "tr" and self._row is not None:
            if self._row:
                self._table["rows"].append(self._row)
            self._row = None
        elif tag == "table" and self._table is not None:
            self.tables.append(self._table)
            self._table = None
        elif tag == "script" and self._in_csvm_script:
            self.scripts.append("".join(self._cell_text))
            self._in_csvm_script = False

    def handle_data(self, data):
        if self._cell_tag is not None or self._in_csvm_script:
            self._cell_text.append(data)


def parse_html(text: str) -> _HTMLDoc:
    doc = _HTMLDoc()
    doc.feed(text)
    return doc


def csvm_metadata(text: str) -> dict | None:
    """The first ``application/csvm+json`` script block, parsed
    (reader.rb:94-107), or None."""
    doc = parse_html(text)
    for s in doc.scripts:
        s = s.strip()
        if s:
            return json.loads(s)
    return None


def html_table_rows(text: str, fragment: str | None) -> list[list[str]] | None:
    """Rows of the table addressed by *fragment* (``<table id=...>``), else
    the first table when no fragment — shaped for :func:`inline_table`:
    the ``<th>`` row leads as the header row, ``<td>`` rows follow
    (metadata.rb:851-873). None when no such table exists."""
    doc = parse_html(text)
    table = None
    for t in doc.tables:
        if fragment is None or t["id"] == fragment:
            table = t
            break
    if table is None:
        return None
    header: list[str] = []
    data: list[list[str]] = []
    for row in table["rows"]:
        if any(tag == "th" for tag, _ in row) and not header:
            header = [text for _, text in row]
        else:
            data.append([text for _, text in row])
    rows = ([header] if header else []) + data
    return rows
