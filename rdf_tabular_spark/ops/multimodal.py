"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is environment-gated: real codecs (PIL / librosa / ffmpeg)
aren't in this container, so decode is STUBBED — either raising
NotImplementedError (strict mode) or producing a deterministic fake
(sha-seeded) so the Spark-side plumbing — schema, batch shape, partitioning,
UDF signatures — is real and testable end-to-end.
"""

from __future__ import annotations

import hashlib

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


def _try_real_decoder(kind: str):
    """Import-gated real decoders; None in this container."""
    try:
        if kind == "image":
            from PIL import Image  # noqa: F401
            return Image
    except ImportError:
        pass
    return None


def decode_strict(kind: str, payload: bytes):
    """The real decode path. STUB: the codec libraries are not available in
    this environment; on a production cluster, ship them via --archives and
    this function dispatches to PIL/librosa/av."""
    if _try_real_decoder(kind) is None:
        raise NotImplementedError(
            f"no {kind} codec in this environment; install PIL/librosa/av")
    raise NotImplementedError("real decoder dispatch not wired in sandbox")


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
