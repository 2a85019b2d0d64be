"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, processed via Arrow-batched ``mapInPandas``.

Image decode is REAL for stdlib-decodable formats: uncompressed 24-bit
BMP and binary PPM (P6) are parsed byte-for-byte in-process (encode +
decode below), so ``decode_strict`` and :func:`decode_images` do actual
pixel work in this container. Heavier codecs (JPEG/PNG pixels, audio,
video) remain environment-gated behind PIL/librosa/av — on a production
cluster ship them via ``--archives`` and the same dispatch picks them up.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 16


def attach_media_column(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Test helper: synthesize an opaque binary payload + metadata from an
    existing table (payload = utf-8 bytes; stands in for image/audio)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        (F.when(F.col(id_col) % 3 == 0, "image")
         .when(F.col(id_col) % 3 == 1, "audio").otherwise("video")).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col(id_col) % 640 + 32).cast("int").alias("width"),
        (F.col(id_col) % 480 + 32).cast("int").alias("height"),
        (F.col(id_col) * 40 % 60000).cast("int").alias("duration_ms"),
    )


def encode_bmp(width: int, height: int,
               pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (BITMAPINFOHEADER, BI_RGB).
    *pixels* is row-major top-down [(r, g, b)]; rows are written
    bottom-up with zero padding to 4-byte stride, per the format."""
    stride = (width * 3 + 3) & ~3
    image_size = stride * height
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + image_size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size,
        2835, 2835, 0, 0)
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for r, g, b in pixels[y]:
            row += bytes((b, g, r))  # BGR on disk
        row += b"\0" * (stride - len(row))
        body += row
    return header + dib + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Parse an uncompressed 24-bit BMP -> (width, height, rgb bytes
    row-major top-down). Pure stdlib; validates magic/bpp/compression."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    header_size, width, height = struct.unpack_from("<Iii", payload, 14)
    bpp, compression = struct.unpack_from("<HI", payload, 28)
    if header_size < 40 or bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    rgb = bytearray(width * height * 3)
    for row in range(height):
        src = data_offset + row * stride
        y = (height - 1 - row) if bottom_up else row
        for x in range(width):
            b, g, r = payload[src + x * 3: src + x * 3 + 3]
            dst = (y * width + x) * 3
            rgb[dst:dst + 3] = bytes((r, g, b))
    return width, height, bytes(rgb)


def encode_ppm(width: int, height: int,
               pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Binary PPM (P6) writer: row-major top-down RGB, maxval 255."""
    body = bytearray()
    for row in pixels:
        for r, g, b in row:
            body += bytes((r, g, b))
    return f"P6\n{width} {height}\n255\n".encode() + bytes(body)


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PPM (P6) -> (width, height, rgb row-major bytes)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens (comments '#...' allowed), then ONE whitespace byte
    pos, fields = 2, []
    while len(fields) < 3:
        while payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while payload[pos:pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    width, height, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval 255 PPM supported")
    body = payload[pos + 1: pos + 1 + width * height * 3]
    return width, height, body


def attach_bmp_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize REAL uncompressed-BMP payloads per row: constant-pixel
    images whose width/height/pixel value derive from the id
    (w = 5 + id%7, h = 4 + id%5, v = id%200 + 10), so an oracle can
    recompute what decode must recover without itself decoding. Widths
    hit non-multiple-of-4 strides and the padding bytes are zero, so a
    decoder that misreads padding as pixels shifts the mean."""
    import pandas as pd

    from ..deploy import ensure_py_files

    ensure_py_files(df.sparkSession)
    staged = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["media_id"]:
                i = int(i)
                w, h, v = 5 + i % 7, 4 + i % 5, i % 200 + 10
                payloads.append(
                    encode_bmp(w, h, [[(v, v, v)] * w for _ in range(h)]))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": "image",
                 "payload": payloads})

    return staged.mapInPandas(
        run, schema="media_id long, kind string, payload binary")


def _try_real_decoder(kind: str):
    """Import-gated heavyweight decoders (PIL/librosa/av); None in this
    container — ship via --archives on a real cluster."""
    try:
        if kind == "image":
            from PIL import Image  # noqa: F401
            return Image
    except ImportError:
        pass
    return None


def decode_strict(kind: str, payload: bytes) -> tuple[int, int, bytes]:
    """The real decode path -> (width, height, rgb bytes). Images in
    stdlib-decodable formats (uncompressed BMP, binary PPM) decode
    in-process; other formats dispatch to PIL when available; audio/video
    remain environment-gated (librosa/av not in this container)."""
    if kind == "image":
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:2] == b"P6":
            return decode_ppm(payload)
        pil = _try_real_decoder("image")
        if pil is not None:
            img = pil.open(__import__("io").BytesIO(payload)).convert("RGB")
            return img.width, img.height, img.tobytes()
        raise NotImplementedError(
            "image format needs PIL (only BMP/PPM decode in-process); "
            "install via --archives")
    raise NotImplementedError(
        f"no {kind} codec in this environment; install librosa/av")


def decode_images(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """REAL decode through the Arrow plumbing: media -> (media_id, width,
    height, n_pixel_bytes, mean_pixel) by actually parsing each payload
    (decode_strict). Map-only mapInPandas; at scale repartition so each
    task's pixel buffers fit executor memory."""
    import pandas as pd

    from ..deploy import ensure_py_files

    ensure_py_files(media.sparkSession)
    schema = ("media_id long, width int, height int, n_pixel_bytes long, "
              "mean_pixel double")

    def run(batches):
        for pdf in batches:
            w, h, nb, mean = [], [], [], []
            for payload in pdf["payload"]:
                dw, dh, rgb = decode_strict("image", bytes(payload))
                w.append(dw)
                h.append(dh)
                nb.append(len(rgb))
                mean.append(round(sum(rgb) / len(rgb), 6) if rgb else 0.0)
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "width": w, "height": h,
                "n_pixel_bytes": nb, "mean_pixel": mean})

    return media.mapInPandas(run, schema=schema)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature vector: sha256-seeded floats in [0,1).
    Replaces the model forward pass so batch shapes/schemas are exercised."""
    h = hashlib.sha256(payload).digest()
    out = []
    for i in range(dim):
        b = hashlib.sha256(h + i.to_bytes(2, "big")).digest()
        out.append(int.from_bytes(b[:4], "big") / 2**32)
    return out


def extract_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """media -> (media_id, kind, feature array<float>, n_bytes) via
    mapInPandas (Arrow batches; the model-inference shape at scale:
    repartition so each task's batch fits accelerator memory)."""
    import pandas as pd

    from ..deploy import ensure_py_files

    ensure_py_files(media.sparkSession)
    schema = "media_id long, kind string, feature array<float>, n_bytes long"

    def run(iterator):
        for pdf in iterator:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": [ _fake_features(p) for p in pdf["payload"] ],
                "n_bytes": pdf["payload"].map(len),
            })

    return media.mapInPandas(run, schema=schema)


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize stub: passes metadata through with the target dims; the
    payload transform raises in-sandbox (decode_strict) but the plumbing —
    filter-pushdown on kind, mapInPandas signature — is real."""
    import pandas as pd

    from ..deploy import ensure_py_files

    ensure_py_files(media.sparkSession)

    def run(iterator):
        for pdf in iterator:
            out = pdf.copy()
            out["width"] = width
            out["height"] = height
            # real path: out["payload"] = [decode_strict("image", p).resize(...) ...]
            yield out

    images = media.filter(F.col("kind") == "image")
    return images.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stub for video: emits (media_id, frame_ts_ms) rows
    from the duration metadata — a posexplode-style expansion, no decode."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ts_ms"))
    )
