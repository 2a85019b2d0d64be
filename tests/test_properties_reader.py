"""Hypothesis properties over reader.to_json and the discovery cascade
(r5 — VERDICT r4 Next-round #8: the property suite found real bugs in
three consecutive rounds; extend it to the two remaining driver-side
pipelines)."""

from __future__ import annotations

import json
import os
import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# cell alphabet stresses JSON escaping, CSV quoting, unicode, and the
# null/empty distinction in one go
CELL = st.text(
    alphabet='ab"\\,:{}[]\u00e9\u2603 \t', min_size=0, max_size=8)
COLNAME = st.sampled_from(["col_a", "col_b", "name", "v"])


def _csv_quote(cell: str) -> str:
    if any(c in cell for c in ',"\n\r'):
        return '"' + cell.replace('"', '""') + '"'
    return cell


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    cols=st.lists(COLNAME, min_size=1, max_size=3, unique=True),
    rows=st.lists(st.lists(CELL, min_size=1, max_size=3),
                  min_size=0, max_size=4),
)
def test_to_json_equals_to_json_lines(spark, tmp_path_factory, cols,
                                      rows):
    """The in-memory document API and the distributed JSONL sink are
    the SAME serialization: to_json(minimal) row objects must equal the
    parsed lines of to_json_lines, in row order, byte-for-byte at the
    value level — whatever the cell contents (JSON metachars, unicode,
    empties)."""
    from rdf_tabular_spark import reader

    tmp = tmp_path_factory.mktemp("tj") / uuid.uuid4().hex
    os.makedirs(tmp)
    p = tmp / "t.csv"
    body = ",".join(cols) + "\n" + "".join(
        ",".join(_csv_quote(c) for c in (r + [""] * len(cols))[:len(cols)])
        + "\n" for r in rows)
    p.write_bytes(body.encode("utf-8"))
    meta = {
        "@context": "http://www.w3.org/ns/csvw",
        "url": "http://example.org/t.csv",
        "tableSchema": {"columns": [{"name": c, "titles": c}
                                    for c in cols]},
    }
    doc = reader.to_json(spark, meta, base="http://example.org/meta.json",
                         url_map={"http://example.org/t.csv": str(p)},
                         mode="minimal")
    out = tmp / "jsonl"
    reader.to_json_lines(
        spark, meta, str(out), base="http://example.org/meta.json",
        url_map={"http://example.org/t.csv": str(p)}, mode="minimal")
    lines = []
    for f in sorted(os.listdir(out)):
        if f.startswith("part-"):
            with open(out / f, encoding="utf-8") as fh:
                lines.extend(json.loads(ln) for ln in fh if ln.strip())
    assert doc == lines


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    depth=st.integers(min_value=0, max_value=3),
    templates=st.lists(
        st.sampled_from(["{+url}-metadata.json", "csv-metadata.json",
                         "meta/{+url}.json", "/root-meta.json",
                         "absent-{+url}.json"]),
        min_size=0, max_size=4),
    place_at=st.integers(min_value=-1, max_value=3),
    describes=st.booleans(),
)
def test_discovery_cascade_first_describing_wins(
        tmp_path_factory, depth, templates, place_at, describes):
    """The cascade is total and lawful for ANY site configuration:
    discover_metadata never raises; it returns the FIRST template whose
    expansion exists AND describes the input, skipping existing
    locations that do not describe it; with no winning location it
    returns None. The .well-known/csvm may sit any number of levels
    above the input (nearest-ancestor rule)."""
    from rdf_tabular_spark.csvw.discovery import (SITE_WIDE_DEFAULT,
                                                  discover_metadata)

    root = tmp_path_factory.mktemp("disc") / uuid.uuid4().hex
    d = root
    for i in range(depth):
        d = d / f"sub{i}"
    os.makedirs(d, exist_ok=True)
    csv_path = d / "input.csv"
    csv_path.write_text("a,b\n1,2\n")
    eff = templates or SITE_WIDE_DEFAULT
    if templates:
        os.makedirs(root / ".well-known", exist_ok=True)
        (root / ".well-known" / "csvm").write_text(
            "".join(t + "\n" for t in templates))

    def loc_for(tmpl):
        loc = tmpl.replace("{+url}", "input.csv").replace(
            "{url}", "input.csv")
        if loc.startswith("/"):
            base_dir = root if templates else d
            return base_dir / loc.lstrip("/")
        return d / loc

    url = "input.csv" if describes else "other.csv"
    placed = None
    if 0 <= place_at < len(eff):
        placed = loc_for(eff[place_at])
        os.makedirs(os.path.dirname(placed), exist_ok=True)
        placed.write_text(json.dumps({
            "@context": "http://www.w3.org/ns/csvw", "url": url}))

    got = discover_metadata(str(csv_path))
    if placed is not None and describes:
        assert got is not None
        assert os.path.abspath(got[0]) == os.path.abspath(str(placed))
    else:
        # nothing placed, or the placed doc does not describe the file
        assert got is None
