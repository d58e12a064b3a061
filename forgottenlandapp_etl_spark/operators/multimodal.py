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


def _decode_stdlib(data: bytes) -> tuple[int, int, list[int]]:
    """Pure-stdlib image decode to 8-bit grayscale: binary PPM (P6) / PGM
    (P5) and uncompressed 24/32-bit bottom-up BMP — the formats whose spec
    fits in a page and needs no codec library. Grayscale via the ITU-R
    601-2 integer luma (299R+587G+114B)//1000. Raises ValueError on
    anything it can't prove it parsed correctly — a media pipeline must
    never emit pixels it guessed."""
    import struct

    if data[:2] in (b"P6", b"P5"):
        # token-based header parse: magic, width, height, maxval, single
        # whitespace, then the raster; '#' comments allowed between tokens
        pos, toks = 2, []
        while len(toks) < 3:
            while pos < len(data) and data[pos : pos + 1].isspace():
                pos += 1
            if data[pos : pos + 1] == b"#":
                while pos < len(data) and data[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            toks.append(int(data[start:pos]))
        pos += 1  # the single whitespace byte after maxval
        w, h, maxval = toks
        if maxval != 255:
            raise ValueError(f"PPM/PGM maxval {maxval} unsupported (want 255)")
        ch = 3 if data[:2] == b"P6" else 1
        raster = data[pos : pos + w * h * ch]
        if len(raster) != w * h * ch:
            raise ValueError("truncated PPM/PGM raster")
        if ch == 1:
            return w, h, list(raster)
        return w, h, [
            (299 * raster[i] + 587 * raster[i + 1] + 114 * raster[i + 2]) // 1000
            for i in range(0, len(raster), 3)
        ]
    if data[:2] == b"BM":
        off, = struct.unpack_from("<I", data, 10)
        hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
        planes, bpp = struct.unpack_from("<HH", data, 26)
        comp, = struct.unpack_from("<I", data, 30)
        if hdr_size < 40 or planes != 1 or comp != 0 or bpp not in (24, 32):
            raise ValueError(f"BMP variant unsupported (bpp={bpp}, comp={comp})")
        flip, h = h > 0, abs(h)
        nb = bpp // 8
        stride = ((w * nb + 3) // 4) * 4
        px: list[int] = []
        for row in range(h):
            base = off + (h - 1 - row if flip else row) * stride
            for col in range(w):
                b, g, r = data[base + col * nb : base + col * nb + 3]
                px.append((299 * r + 587 * g + 114 * b) // 1000)
        return w, h, px
    raise ValueError(f"unrecognized image magic {data[:2]!r}")


def _resize_nearest(
    w: int, h: int, px: list[int], tw: int, th: int
) -> list[int]:
    """Nearest-neighbor resample (pixel-center mapping) — deterministic
    integer-only resize for the stdlib decode branch."""
    return [
        px[min(h - 1, (y * 2 + 1) * h // (2 * th)) * w
           + min(w - 1, (x * 2 + 1) * w // (2 * tw))]
        for y in range(th)
        for x in range(tw)
    ]


def decode_media(df: DataFrame, target_size: tuple[int, int] = (224, 224)) -> DataFrame:
    """Decode + resize stage — REAL in every environment.

    Each payload is decoded to 8-bit grayscale and resized to
    ``target_size``, emitted as a flat ``pixels`` array with the same
    schema the deterministic fake uses, so downstream stages are
    codec-agnostic. Decoder resolution, per payload, INSIDE the Arrow
    batch function (on a real cluster the probe must hold on executors,
    not just the driver): Pillow when importable (any format, bicubic
    resize); otherwise the pure-stdlib PPM/PGM/uncompressed-BMP decoder
    with nearest-neighbor resize (:func:`_decode_stdlib` — closes the
    this-container codec gap with formats whose spec fits in a page);
    otherwise the task fails loudly with NotImplementedError — a missing
    executor-side codec must never silently fake pixels
    (:func:`fake_decode_media` is the clearly-marked fake for plumbing
    tests). The two decode branches differ in resampling filter by design;
    pipelines needing bit-stable features across environments must pin the
    decoder, exactly as they would pin a codec build.
    """
    w, h = target_size
    out_schema = "media_id BIGINT, width INT, height INT, pixels ARRAY<INT>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        use_pil = _real_decoder_available()
        if use_pil:
            from PIL import Image

        for pdf in it:
            ids, px = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                if use_pil:
                    img = Image.open(io.BytesIO(raw)).convert("L").resize((w, h))
                    pix = [int(v) for v in img.getdata()]
                else:
                    try:
                        sw, sh, spx = _decode_stdlib(raw)
                    except ValueError as exc:
                        raise NotImplementedError(
                            f"media_id={mid}: no codec for this payload in "
                            f"this environment ({exc}); install Pillow or "
                            "use fake_decode_media() for plumbing tests"
                        ) from exc
                    pix = _resize_nearest(sw, sh, spx, w, h)
                ids.append(mid)
                px.append(pix)
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


#: scene-cut threshold on the per-frame brightness-proxy delta (sum of
#: byte values, 0..4080 for a 16-byte frame) — a cut opens a new scene
#: when consecutive sampled frames differ by more than this
SCENE_CUT_THRESHOLD = 64


def frame_signature(frames: DataFrame) -> DataFrame:
    """Per-frame compact signature: the byte-value sum (a brightness proxy
    — the cheapest luminance statistic a real decoder would emit, here
    computed directly from the payload bytes so the oracle can reproduce
    it). Rides the HEX carrier (uppercase, 2 chars/byte in both engines)
    so the statistic is byte-faithful for ANY payload, not just ASCII:
    sig = Σ_j int(hex[2j−1..2j], 16). Pure per-row array math in codegen;
    handles the short tail frame (fewer than frame_bytes bytes)."""
    return frames.select(
        "media_id",
        "frame_idx",
        F.expr(
            "aggregate(transform(sequence(1, length(hex(frame_bytes)) div 2),"
            " j -> cast(conv(substr(hex(frame_bytes), 2*j - 1, 2), 16, 10)"
            " as bigint)), cast(0 as bigint), (a, x) -> a + x)"
        ).alias("sig"),
    )


def scene_segments(
    sigs: DataFrame, threshold: int = SCENE_CUT_THRESHOLD
) -> DataFrame:
    """Scene segmentation from frame signatures: a cut opens wherever
    |sig_i − sig_{i−1}| > threshold (LAG within each media, ordered by the
    deterministic frame_idx), scene ids are the running cut count, and
    each (media, scene) collapses to (start_frame, end_frame, n_frames).
    Two media-partitioned window passes plus one hash aggregate — the
    shuffle key is media_id throughout, so the three stages reuse one
    partitioning; nothing global, nothing quadratic."""
    from pyspark.sql import Window

    w = Window.partitionBy("media_id").orderBy("frame_idx")
    cut = (
        F.abs(F.col("sig") - F.lag("sig").over(w)) > F.lit(threshold)
    ).cast("long")
    scened = sigs.withColumn(
        "scene_idx",
        F.sum(F.coalesce(cut, F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return scened.groupBy("media_id", "scene_idx").agg(
        F.min("frame_idx").cast("long").alias("start_frame"),
        F.max("frame_idx").cast("long").alias("end_frame"),
        F.count(F.lit(1)).cast("long").alias("n_frames"),
    )
