"""Distributed record framing (sources/framing.py).

The gold standard is a sequential consuming scan (the round-3 driver
splitter's semantics, itself validated against the reference's Ruby CSV
framing) — the property tests replay adversarial byte streams through
both at chunk sizes small enough that every boundary case (terminator
straddling a chunk, quoted region spanning many whole chunks, CRLF
suppressing the LF inside it across a boundary) actually occurs."""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rdf_tabular_spark.sources.framing import (can_frame_distributed,
                                               chain_safe, frame_records)


def reference_split(text: str, terms: list[str], quote: str | None) -> list[str]:
    """Sequential consuming scan — byte-for-byte the semantics the
    distributed path must reproduce."""
    data = text
    ts = sorted(terms, key=len, reverse=True)
    recs, buf, i, in_q = [], "", 0, False
    while i < len(data):
        ch = data[i]
        if quote is not None and ch == quote:
            in_q = not in_q
            buf += ch
            i += 1
            continue
        hit = None
        if not in_q:
            for t in ts:
                if data.startswith(t, i):
                    hit = t
                    break
        if hit:
            recs.append(buf)
            buf = ""
            i += len(hit)
        else:
            buf += ch
            i += 1
    if buf:
        recs.append(buf)
    return recs


def _run(spark, tmp_path, text, terms, quote, chunk_bytes):
    p = str(tmp_path / "f.csv")
    with open(p, "w", encoding="utf-8", newline="") as f:
        f.write(text)
    got = frame_records(spark, p, terms, quote,
                        chunk_bytes=chunk_bytes).collect()
    by_no = {r["_sourceRow"]: r["value"] for r in got}
    assert sorted(by_no) == list(range(1, len(by_no) + 1))
    return [by_no[i] for i in sorted(by_no)]


def test_chain_safe_gate():
    assert chain_safe([b"\n"])
    assert chain_safe([b"\r\n", b"\n"])  # CRLF suppresses its LF, depth 1
    assert chain_safe([b"*\n"])
    assert chain_safe([b";"])
    assert not chain_safe([b"aa"])  # self-overlap: unbounded chains
    assert not chain_safe([b";\n", b"\n;"])


def test_can_frame_gate():
    assert can_frame_distributed(["\r\n", "\n"], '"', "utf-8")
    assert can_frame_distributed([";"], None, "latin-1")
    assert not can_frame_distributed(["\n"], '"', "utf-16")
    assert not can_frame_distributed(["\n"], '"', "utf-8",
                                     double_quote=False)
    assert not can_frame_distributed(['"'], '"', "utf-8")  # quote in term


def test_quoted_newline_across_chunks(spark, tmp_path):
    text = 'a,"x\ny",b\nc,"p\r\nq",d\r\ne,f,g\n'
    want = reference_split(text, ["\r\n", "\n"], '"')
    for cb in (3, 5, 7, 64):
        got = _run(spark, tmp_path, text, ["\r\n", "\n"], '"', cb)
        assert got == want, (cb, got, want)


def test_crlf_suppression_at_boundary(spark, tmp_path):
    # \r\n straddling every possible chunk boundary must never double-fire
    text = "aa\r\nbb\r\n\r\ncc\r\n"
    want = reference_split(text, ["\r\n", "\n"], '"')
    assert want == ["aa", "bb", "", "cc"]
    for cb in range(2, 10):
        got = _run(spark, tmp_path, text, ["\r\n", "\n"], '"', cb)
        assert got == want, (cb, got)


def test_multichar_custom_terminator(spark, tmp_path):
    # the tree-ops-ext dialect shape: '*\n' ends a record, bare '\n' is data
    text = 'x,"a\nb",1*\ny,c,2*\nz,d,3'
    want = reference_split(text, ["*\n"], '"')
    assert want == ['x,"a\nb",1', "y,c,2", "z,d,3"]
    for cb in range(2, 12):
        got = _run(spark, tmp_path, text, ["*\n"], '"', cb)
        assert got == want, (cb, got)


def test_quoted_region_spanning_whole_chunks(spark, tmp_path):
    # one quoted cell longer than several chunks: its fragments chain
    # through the boundary assembly as head+tail of every middle chunk
    body = "L1\nL2\nL3\nL4\nL5"
    text = f'k,"{body}",v\nm,n,o\n'
    want = reference_split(text, ["\n"], '"')
    for cb in (2, 3, 4):
        got = _run(spark, tmp_path, text, ["\n"], '"', cb)
        assert got == want, (cb, got)


def test_multibyte_char_split_by_chunk(spark, tmp_path):
    # UTF-8 continuation bytes split across chunks must reassemble
    # before decoding
    text = "é,ü\n日本,語\nmixed,é日\n"
    want = reference_split(text, ["\n"], '"')
    for cb in range(2, 9):
        got = _run(spark, tmp_path, text, ["\n"], '"', cb)
        assert got == want, (cb, got)


def test_unterminated_quote_to_eof(spark, tmp_path):
    text = 'a,b\nc,"open\nnever closed'
    want = reference_split(text, ["\n"], '"')
    assert want == ["a,b", 'c,"open\nnever closed']
    for cb in (3, 5, 100):
        got = _run(spark, tmp_path, text, ["\n"], '"', cb)
        assert got == want, (cb, got)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    text=st.text(alphabet='ab,"\n\r*;', min_size=0, max_size=60),
    termset=st.sampled_from([["\n"], ["\r\n", "\n"], ["*\n"], [";"],
                             [";", "\n"]]),
    chunk=st.integers(min_value=2, max_value=9),
)
def test_property_matches_reference(spark, tmp_path_factory, text,
                                    termset, chunk):
    import uuid

    tmp = tmp_path_factory.mktemp("frame") / f"{uuid.uuid4().hex}"
    os.makedirs(tmp)
    want = reference_split(text, termset, '"')
    got = _run(spark, tmp, text, termset, '"', chunk)
    assert got == want, (text, termset, chunk)
