"""Multimodal column plumbing (SURVEY.md §7.6).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` stages — the shape that
moves 100 TB of media through executors without ever materializing rows on
the driver. The actual codec step is STUBBED (no image/audio libs in this
container): ``decode_media`` tries a real decoder import and otherwise
applies a clearly-marked deterministic fake, so the Spark-side plumbing —
schema, partition sizing, UDF signature, Arrow batch shape — is real and
tested while the codec is swappable.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Typed media row: payload + metadata travel together; partition by media
# kind so per-kind decode stages scan only their slice.
MEDIA_SCHEMA = (
    "media_id BIGINT, kind STRING, mime STRING, payload BINARY, "
    "n_bytes BIGINT, meta STRING"
)

FEATURE_SCHEMA = (
    "media_id BIGINT, kind STRING, n_bytes BIGINT, sha256 STRING, "
    "crc32 BIGINT, entropy_proxy DOUBLE"
)

FRAME_SCHEMA = "media_id BIGINT, frame_idx INT, frame_bytes BINARY"


def _real_decoder_available() -> bool:
    try:  # pragma: no cover - container has no PIL
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def attach_media(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Wrap a column as a typed binary media payload (ingestion-edge shim;
    real pipelines land bytes straight from the object store)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.to_json(F.struct(F.lit(kind).alias("kind"))).alias("meta"),
    )


def media_features(df: DataFrame) -> DataFrame:
    """Arrow-batched byte-level feature extraction over binary payloads.

    Real computation (hashes + a compression-ratio entropy proxy), real
    batch shape: pandas in, pandas out, never a driver collect. This is the
    template every codec stage follows.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "crc32": payloads.map(lambda b: zlib.crc32(b)).astype("int64"),
                    "entropy_proxy": payloads.map(
                        lambda b: len(zlib.compress(b)) / len(b) if len(b) else 0.0
                    ).astype("float64"),
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def decode_media(df: DataFrame, target_size: tuple[int, int] = (224, 224)) -> DataFrame:
    """Decode + resize stage, real when a codec is importable.

    With Pillow present each payload is decoded as an image, converted to
    8-bit grayscale and resized to ``target_size`` — emitted as a flat
    ``pixels`` array with the same schema the deterministic fake uses, so
    downstream stages are codec-agnostic. Without a codec (this container)
    the stage raises; use :func:`fake_decode_media` for plumbing tests.
    The Pillow import happens INSIDE the Arrow batch function — on a real
    cluster the probe must hold on executors, not just the driver, and a
    missing executor-side codec should fail the task loudly.
    """
    if not _real_decoder_available():
        raise NotImplementedError(
            "media codec not available in this environment; use "
            "fake_decode_media() for plumbing tests or install a codec"
        )
    w, h = target_size
    out_schema = "media_id BIGINT, width INT, height INT, pixels ARRAY<INT>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in it:
            ids, px = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = (
                    Image.open(io.BytesIO(bytes(payload)))
                    .convert("L")
                    .resize((w, h))
                )
                ids.append(mid)
                px.append([int(v) for v in img.getdata()])
            yield pd.DataFrame(
                {"media_id": ids, "width": w, "height": h, "pixels": px}
            )

    return df.mapInPandas(batches, schema=out_schema)


def fake_decode_media(df: DataFrame, side: int = 8) -> DataFrame:
    """CLEARLY-MARKED deterministic fake decode: derives a ``side×side``
    'pixel' grid from the payload bytes (repeating pattern). Exercises the
    exact schema/batching a real decoder would use."""
    out_schema = f"media_id BIGINT, width INT, height INT, pixels ARRAY<INT>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = side * side
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": side,
                    "height": side,
                    "pixels": pdf["payload"].map(
                        lambda b: [b[i % len(b)] for i in range(n)] if len(b) else [0] * n
                    ),
                }
            )

    return df.mapInPandas(batches, schema=out_schema)


def frame_sample(df: DataFrame, every: int = 4, frame_bytes: int = 16) -> DataFrame:
    """Frame-sampling stage for video-kind payloads: emit every ``every``-th
    fixed-size chunk as a frame row (1→N mapInPandas fan-out — the shape
    matters; the chunking stands in for codec keyframe extraction)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                chunks = [
                    payload[o : o + frame_bytes]
                    for o in range(0, len(payload), frame_bytes)
                ]
                for i, ch in enumerate(chunks[::every]):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(ch)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)
