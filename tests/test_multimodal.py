"""Multimodal ops: REAL stdlib image decode (BMP/PPM) + Arrow plumbing.

The r2 verdict flagged decode as a stub; these pin the de-stubbed path:
byte-exact codec roundtrips (padding, bottom-up row order, header
comments) and an end-to-end mapInPandas decode of real payloads.
"""
from __future__ import annotations

import pytest

# a 3x2 asymmetric image: catches row-order and stride/padding mistakes
PIXELS = [
    [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
    [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
]


def _flat(pixels):
    return bytes(c for row in pixels for px in row for c in px)


def test_bmp_roundtrip_exact():
    from rdf_tabular_spark.ops.multimodal import decode_bmp, encode_bmp

    payload = encode_bmp(3, 2, PIXELS)
    assert payload[:2] == b"BM"
    # width 3 -> stride 12 (3 pad bytes/row); those bytes must be skipped
    w, h, rgb = decode_bmp(payload)
    assert (w, h) == (3, 2)
    assert rgb == _flat(PIXELS)


def test_ppm_roundtrip_exact_with_comment():
    from rdf_tabular_spark.ops.multimodal import decode_ppm, encode_ppm

    payload = encode_ppm(3, 2, PIXELS)
    w, h, rgb = decode_ppm(payload)
    assert (w, h, rgb) == (3, 2, _flat(PIXELS))
    # header comments are legal PPM; the parser must skip them
    commented = payload.replace(b"P6\n", b"P6\n# a comment\n", 1)
    assert decode_ppm(commented) == (3, 2, _flat(PIXELS))


def test_decode_strict_dispatch():
    from rdf_tabular_spark.ops.multimodal import decode_strict, encode_bmp

    w, h, rgb = decode_strict("image", encode_bmp(3, 2, PIXELS))
    assert (w, h, rgb) == (3, 2, _flat(PIXELS))
    with pytest.raises(NotImplementedError):
        decode_strict("audio", b"RIFF....WAVE")
    with pytest.raises(NotImplementedError):
        decode_strict("image", b"\x89PNG\r\n\x1a\n not decodable here")


def test_decode_images_end_to_end(spark):
    """Real bytes through the real Arrow plumbing: synthesize BMPs with
    id-derived dims/value, decode via mapInPandas, verify every field."""
    from rdf_tabular_spark.ops.multimodal import attach_bmp_media, decode_images

    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    out = {r.media_id: r
           for r in decode_images(attach_bmp_media(ids)).collect()}
    assert len(out) == 40
    for i in range(40):
        w, h, v = 5 + i % 7, 4 + i % 5, i % 200 + 10
        r = out[i]
        assert (r.width, r.height) == (w, h)
        assert r.n_pixel_bytes == w * h * 3
        assert r.mean_pixel == float(v)
