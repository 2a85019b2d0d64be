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
    # WAV is decodable but through the sample-domain API, not (w, h, rgb)
    with pytest.raises(ValueError):
        decode_strict("audio", b"RIFF....WAVE")
    with pytest.raises(NotImplementedError):
        decode_strict("audio", b"\xffOGG not a riff container")
    # a real PNG magic with garbage chunks fails parsing, not dispatch
    with pytest.raises(ValueError):
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


def test_png_roundtrip_exact():
    from rdf_tabular_spark.ops.multimodal import decode_png, encode_png

    pixels = [[(x * 16 % 256, y * 32 % 256, (x + y) % 256)
               for x in range(5)] for y in range(3)]
    w, h, rgb = decode_png(encode_png(5, 3, pixels))
    assert (w, h) == (5, 3)
    assert rgb == bytes(b for row in pixels for px in row for b in px)


def test_png_rgba_alpha_dropped():
    from rdf_tabular_spark.ops.multimodal import decode_png, encode_png

    pixels = [[(10, 20, 30, 255), (40, 50, 60, 128)]]
    w, h, rgb = decode_png(encode_png(2, 1, pixels))
    assert (w, h) == (2, 1)
    assert rgb == bytes((10, 20, 30, 40, 50, 60))


def test_png_defilter_all_types():
    """Hand-filter scanlines with Sub/Up/Average/Paeth and check the
    decoder reconstructs the original pixels (PNG spec §9 recurrences)."""
    import struct
    import zlib

    from rdf_tabular_spark.ops.multimodal import (
        _paeth, _png_chunk, _PNG_MAGIC, decode_png)

    w, h, bpp = 4, 5, 3
    rows = [bytes((x * 7 + y * 13 + c) % 256 for x in range(w)
                  for c in range(bpp)) for y in range(h)]
    raw = bytearray()
    prior = bytes(w * bpp)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        line = rows[y]
        raw.append(ftype)
        for x in range(w * bpp):
            left = line[x - bpp] if x >= bpp else 0
            up = prior[x]
            ul = prior[x - bpp] if x >= bpp else 0
            if ftype == 0:
                raw.append(line[x])
            elif ftype == 1:
                raw.append((line[x] - left) & 0xFF)
            elif ftype == 2:
                raw.append((line[x] - up) & 0xFF)
            elif ftype == 3:
                raw.append((line[x] - ((left + up) >> 1)) & 0xFF)
            else:
                raw.append((line[x] - _paeth(left, up, ul)) & 0xFF)
        prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
               + _png_chunk(b"IEND", b""))
    dw, dh, rgb = decode_png(payload)
    assert (dw, dh) == (w, h)
    assert rgb == b"".join(rows)


def test_png_decode_strict_dispatch():
    from rdf_tabular_spark.ops.multimodal import decode_strict, encode_png

    w, h, rgb = decode_strict("image", encode_png(2, 2, [[(9, 9, 9)] * 2] * 2))
    assert (w, h) == (2, 2) and set(rgb) == {9}


def test_wav_roundtrip_exact():
    from rdf_tabular_spark.ops.multimodal import decode_wav, encode_wav

    ch, sr, nf, rms = decode_wav(encode_wav(16000, 3200, 750))
    assert (ch, sr, nf) == (1, 16000, 3200)
    assert rms == 750.0  # square wave: every |sample| == amplitude

    ch, _, nf, rms = decode_wav(encode_wav(8000, 100, 10, channels=2))
    assert (ch, nf, rms) == (2, 100, 10.0)


def test_wav_rejects_non_riff():
    import pytest

    from rdf_tabular_spark.ops.multimodal import decode_wav

    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")


def test_decode_audio_end_to_end(spark):
    from rdf_tabular_spark.ops.multimodal import attach_wav_media, decode_audio

    docs = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    out = {r.media_id: r for r in
           decode_audio(attach_wav_media(docs)).collect()}
    assert len(out) == 30
    for i in range(30):
        r = out[i]
        sr, nf, amp = 8000 * (1 + i % 2), 2000 + (i % 5) * 400, 500 + i % 1000
        assert (r.channels, r.sample_rate, r.n_frames) == (1, sr, nf)
        assert r.duration_ms == nf * 1000.0 / sr
        assert r.rms == float(amp)


def test_decode_images_png_end_to_end(spark):
    from rdf_tabular_spark.ops.multimodal import attach_png_media, decode_images

    docs = spark.range(0, 25).withColumnRenamed("id", "doc_id")
    out = {r.media_id: r for r in
           decode_images(attach_png_media(docs)).collect()}
    assert len(out) == 25
    for i in range(25):
        w, h, v = 5 + i % 7, 4 + i % 5, i % 200 + 10
        r = out[i]
        assert (r.width, r.height) == (w, h)
        assert r.n_pixel_bytes == w * h * 3
        assert r.mean_pixel == float(v)
