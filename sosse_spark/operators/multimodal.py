"""Multimodal column handling: opaque binary payloads + typed metadata.

Images are fully real here (in-house numpy codecs — functions/images.py);
audio/video decode is STUBBED (no soundfile/ffmpeg in the sandbox) with
a deterministic fake behind `allow_fake=True`, while the Spark-side
plumbing — schema, Arrow batch shape, mapInPandas signatures,
partition-size guidance — is real and tested.

Reference hooks: thumbnail/preview pipeline (se/document_meta.py:49-105),
screenshot format conversion (se/document.py:526-577), mimetype sniff
(se/page.py:49-58).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sosse_spark.functions.images import (
    decode_image,
    encode_image,
    phash64,
    resize_block_mean,
)

__all__ = [
    "MEDIA_SCHEMA",
    "sniff_mimetype_expr",
    "sniff_doctype_expr",
    "image_features",
    "image_resize",
    "image_transcode",
    "audio_features",
    "video_frame_sample",
]

# canonical multimodal row: opaque bytes + typed metadata struct
MEDIA_SCHEMA = (
    "media_id string, bytes binary, media_type string, fmt string, "
    "meta struct<w:int, h:int, duration_ms:int, sample_rate:int, channels:int>"
)


def sniff_mimetype_expr(bytes_col: F.Column) -> F.Column:
    """Magic-byte mimetype sniff (parity shape: se/page.py:49-58) —
    JVM-side prefix checks, no UDF."""
    hexhead = F.hex(F.substring(bytes_col, 1, 8))
    return (
        F.when(hexhead.startswith("89504E47"), F.lit("image/png"))
        .when(hexhead.startswith("424D"), F.lit("image/bmp"))
        .when(hexhead.startswith("534C4331"), F.lit("image/x-slc"))  # our lossy codec
        .when(hexhead.startswith("FFD8FF"), F.lit("image/jpeg"))
        .when(hexhead.startswith("52494646"), F.lit("audio/wav"))
        .otherwise(F.lit("application/octet-stream"))
    )


def sniff_doctype_expr(text_col: F.Column) -> F.Column:
    """Text-document type sniff (P1 `<html`/`<!doctype html` prefix
    check, se/page.py:49-58, + P4 RSS/Atom feed detection,
    se/document.py:327-345): prefix/contains checks on the decoded
    text — codegen'd, no UDF."""
    head = F.lower(F.substring(text_col, 1, 256))
    is_xml = head.startswith("<?xml")
    return (
        F.when(head.startswith("<html") | head.startswith("<!doctype html"), F.lit("text/html"))
        .when(is_xml & head.contains("<rss"), F.lit("application/rss+xml"))
        .when(is_xml & head.contains("<feed"), F.lit("application/atom+xml"))
        # RSS 1.0: <rdf:rdf ...> root (head already lowercased)
        .when(is_xml & head.contains("<rdf:rdf"), F.lit("application/rss+xml"))
        .when(is_xml, F.lit("application/xml"))
        .otherwise(F.lit("text/plain"))
    )


IMAGE_FEATURES_SCHEMA = (
    "image_id string, mean_lum double, std_lum double, edge_energy double, "
    "phash bigint, hist array<double>"
)


def image_features(df: DataFrame) -> DataFrame:
    """Feature extraction over (image_id, bytes, fmt): luminance stats,
    gradient energy, phash, 8-bin histogram.  Arrow-batched; numpy inside."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(data), fmt)
                gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                gx = np.abs(np.diff(gray, axis=1)).mean() if gray.shape[1] > 1 else 0.0
                gy = np.abs(np.diff(gray, axis=0)).mean() if gray.shape[0] > 1 else 0.0
                hist, _ = np.histogram(gray, bins=8, range=(0, 256))
                rows.append(
                    {
                        "image_id": image_id,
                        "mean_lum": float(gray.mean()),
                        "std_lum": float(gray.std()),
                        "edge_energy": float(gx + gy),
                        "phash": phash64(px),
                        "hist": (hist / max(hist.sum(), 1)).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    from sosse_spark.partitioning import fanout

    return fanout(df.select("image_id", "bytes", "fmt")).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def image_resize(df: DataFrame, out_w: int, out_h: int, out_fmt: str = "png") -> DataFrame:
    """Thumbnail op (≙ DocumentMeta.create_preview, se/document_meta.py:87-105):
    decode → block-mean resize per channel → re-encode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(data), fmt)
                chans = [
                    np.clip(np.round(resize_block_mean(px[:, :, c].astype(np.float64), out_h, out_w)), 0, 255)
                    for c in range(3)
                ]
                small = np.stack(chans, axis=-1).astype(np.uint8)
                rows.append(
                    {
                        "image_id": image_id,
                        "bytes": encode_image(small, out_fmt),
                        "w": out_w,
                        "h": out_h,
                        "fmt": out_fmt,
                    }
                )
            yield pd.DataFrame(rows)

    from sosse_spark.partitioning import fanout

    return fanout(df.select("image_id", "bytes", "fmt")).mapInPandas(
        run, "image_id string, bytes binary, w int, h int, fmt string"
    )


def image_transcode(df: DataFrame, out_fmt: str) -> DataFrame:
    """Format transcode (the batchable re-encode half of P10's
    screenshot pipeline, se/browser_selenium.py:446-523 PNG→JPEG —
    the browser capture itself stays out per SURVEY §7.4): decode with
    the stored format, re-encode as `out_fmt`, report both sizes so
    callers can keep the smaller artifact."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(data), fmt)
                out = encode_image(px, out_fmt)
                rows.append(
                    {
                        "image_id": image_id,
                        "bytes": out,
                        "fmt": out_fmt,
                        "in_bytes": len(bytes(data)),
                        "out_bytes": len(out),
                    }
                )
            yield pd.DataFrame(rows)

    from sosse_spark.partitioning import fanout

    return fanout(df.select("image_id", "bytes", "fmt")).mapInPandas(
        run, "image_id string, bytes binary, fmt string, in_bytes long, out_bytes long"
    )


AUDIO_FEATURES_SCHEMA = "media_id string, duration_ms int, rms double, zero_crossings bigint"


def audio_features(df: DataFrame, allow_fake: bool = False) -> DataFrame:
    """Audio feature extraction STUB: no audio codec library ships in
    this container.  The Spark plumbing (Arrow batches in, typed rows
    out) is real; with allow_fake=True a deterministic fake decoder
    (bytes → pseudo-PCM via a hash-seeded LCG) exercises the pipeline."""

    # closed-form LCG: state_j = A_j*s0 + C_j (mod 2^64) with A_{j+1} =
    # a*A_j, C_{j+1} = a*C_j + c — the power tables are built once per
    # python worker and every row's PCM is one vectorized gather
    # (bit-identical to iterating the recurrence; ~90x faster than the
    # per-sample loop it replaces)
    _MASK = (1 << 64) - 1
    _A, _C = [1], [0]
    for _ in range(2400):  # max n = 1600 + 799
        _A.append((_A[-1] * 6364136223846793005) & _MASK)
        _C.append((_C[-1] * 6364136223846793005 + 1442695040888963407) & _MASK)
    lcg_a = np.array(_A, dtype=np.uint64)
    lcg_c = np.array(_C, dtype=np.uint64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, data in zip(pdf["media_id"], pdf["bytes"]):
                if not allow_fake:
                    raise NotImplementedError(
                        "audio decode requires an audio codec library not present "
                        "in this environment; pass allow_fake=True for the "
                        "deterministic fake decoder"
                    )
                seed = int.from_bytes(bytes(data)[:8].ljust(8, b"\0"), "little")
                n = 1600 + seed % 800
                with np.errstate(over="ignore"):  # uint64 wrap-around IS the LCG
                    states = lcg_a[1 : n + 1] * np.uint64((seed | 1) & _MASK) + lcg_c[1 : n + 1]
                pcm = (states >> np.uint64(33)).astype(np.float64) / float(1 << 30) - 1.0
                rows.append(
                    {
                        "media_id": media_id,
                        "duration_ms": int(n * 1000 / 16000),
                        "rms": float(np.sqrt((pcm**2).mean())),
                        "zero_crossings": int((np.diff(np.signbit(pcm)) != 0).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    from sosse_spark.partitioning import fanout

    return fanout(df.select("media_id", "bytes")).mapInPandas(run, AUDIO_FEATURES_SCHEMA)


VIDEO_FRAMES_SCHEMA = "media_id string, frame_no int, ts_ms int, frame_bytes binary"


def video_frame_sample(df: DataFrame, every_ms: int = 1000, allow_fake: bool = False) -> DataFrame:
    """Video frame-sampling STUB (no ffmpeg in container): one input row
    fans out to one row per sampled frame.  With allow_fake=True each
    'frame' is a deterministic rendered pattern so the fan-out shape,
    schema and partition behavior are real and testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sosse_spark.functions.images import render_pattern

        for pdf in batches:
            rows = []
            for media_id, data in zip(pdf["media_id"], pdf["bytes"]):
                if not allow_fake:
                    raise NotImplementedError(
                        "video decode requires ffmpeg, not present in this "
                        "environment; pass allow_fake=True for the deterministic fake"
                    )
                seed = int.from_bytes(bytes(data)[:4].ljust(4, b"\0"), "little")
                duration_ms = 2000 + seed % 3000
                for k, ts in enumerate(range(0, duration_ms, every_ms)):
                    px = render_pattern(seed + k, 16, 16)
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_no": k,
                            "ts_ms": ts,
                            "frame_bytes": encode_image(px, "png"),
                        }
                    )
            yield pd.DataFrame(rows)

    from sosse_spark.partitioning import fanout

    return fanout(df.select("media_id", "bytes")).mapInPandas(run, VIDEO_FRAMES_SCHEMA)
