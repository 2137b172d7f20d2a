"""Image codecs + perceptual hashing, pure numpy/zlib (no PIL/cv2 in env).

Role in the graft: the corpus payload is (bytes, w, h, fmt, caption,
phash) per BASELINE.json input_hint.  `bytes` stands in for SOSSE's
fetched Page.content (se/page.py:35-58); `phash` stands in for
content_hash (se/document.py:274-298); the thumbnail/preview pipeline
(se/document_meta.py:49-105) maps to decode/resize ops here.

Codecs:
  * bmp   — 24-bit uncompressed BMP (exact round-trip)
  * png   — 8-bit RGB, zlib, filter 0 (exact round-trip)
  * lossy — 8x8 block DCT with uniform quantization (in-house toy
            transform codec; exercises the PSNR>=40 dB gate)

Spark-side plumbing (decode_batch / phash / PSNR) is Arrow-batched via
mapInPandas — never per-row Python in the plan.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

__all__ = [
    "render_pattern",
    "encode_image",
    "decode_image",
    "encode_bmp",
    "decode_bmp",
    "encode_png",
    "decode_png",
    "encode_lossy",
    "decode_lossy",
    "psnr",
    "phash64",
    "resize_block_mean",
    "decode_stats_map_in_pandas",
]

_LOSSY_MAGIC = b"SLC1"  # sosse_spark lossy codec v1
_LOSSY_Q = 3.0  # uniform quantization step — keeps PSNR well above 40 dB


# ---------------------------------------------------------------------------
# Deterministic test pattern (FIXTURES.md §1): gradient + sin(i)-phased
# checker.  Seeded by row index only — fully reproducible.
# ---------------------------------------------------------------------------

def render_pattern(i: int, w: int, h: int) -> np.ndarray:
    """(h, w, 3) uint8 deterministic pattern for row index `i`."""
    ys = np.arange(h, dtype=np.float64)[:, None]
    xs = np.arange(w, dtype=np.float64)[None, :]
    phase = np.sin(float(i))
    grad = (xs / max(w - 1, 1) * 255.0 + ys / max(h - 1, 1) * 128.0) / 1.5
    checker = (((xs // 4 + ys // 4) % 2) * 96.0) * (0.5 + 0.5 * phase)
    r = np.clip(grad + checker, 0, 255)
    g = np.clip(255.0 - grad + checker * 0.5, 0, 255)
    b = np.clip((grad + 64.0 * phase) % 256.0, 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB, bottom-up rows, 4-byte padded)
# ---------------------------------------------------------------------------

def encode_bmp(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    row_len = (w * 3 + 3) & ~3
    img_size = row_len * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    pad = b"\x00" * (row_len - w * 3)
    bgr = px[:, :, ::-1]
    for y in range(h - 1, -1, -1):
        rows.append(bgr[y].tobytes() + pad)
    return header + info + b"".join(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    w = struct.unpack_from("<i", data, 18)[0]
    h = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    row_len = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        start = offset + (h - 1 - y) * row_len
        row = np.frombuffer(data, dtype=np.uint8, count=w * 3, offset=start).reshape(w, 3)
        out[y] = row[:, ::-1]
    return out


# ---------------------------------------------------------------------------
# PNG (8-bit RGB, single IDAT, filter type 0 per scanline)
# ---------------------------------------------------------------------------

def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    if ftype == 0:
        return cur
    cur = cur.astype(np.int32)
    prev32 = prev.astype(np.int32)
    out = np.zeros_like(cur)
    if ftype == 2:  # Up
        return ((cur + prev32) & 0xFF).astype(np.uint8)
    for x in range(len(cur)):
        left = out[x - bpp] if x >= bpp else 0
        up = prev32[x]
        if ftype == 1:
            out[x] = (cur[x] + left) & 0xFF
        elif ftype == 3:
            out[x] = (cur[x] + (left + up) // 2) & 0xFF
        elif ftype == 4:
            ul = out[x - bpp] if False else (prev32[x - bpp] if x >= bpp else 0)
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            out[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, w = 8, 0
    idat = b""
    h = bitdepth = coltype = 0
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, coltype = struct.unpack_from(">IIBB", payload)[:4]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if bitdepth != 8 or coltype != 2:
        raise ValueError("only 8-bit RGB supported")
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.empty((h, w, 3), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        cur = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1)
        row = _png_unfilter(ftype, cur, prev, 3)
        out[y] = row.reshape(w, 3)
        prev = row
    return out


# ---------------------------------------------------------------------------
# Lossy: 8x8 block DCT-II, uniform quantization, int16 coefficients, zlib.
# ---------------------------------------------------------------------------

def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT8 = _dct_matrix(8)


def _blockify(chan: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = chan.shape
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    padded = np.zeros((ph, pw), dtype=np.float64)
    padded[:h, :w] = chan
    if h < ph:
        padded[h:, :w] = chan[-1:, :]
    if w < pw:
        padded[:, w:] = padded[:, w - 1 : w]
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    return blocks, ph, pw


def encode_lossy(px: np.ndarray, q: float = _LOSSY_Q) -> bytes:
    h, w, _ = px.shape
    coefs = []
    for c in range(3):
        blocks, ph, pw = _blockify(px[:, :, c].astype(np.float64) - 128.0)
        d = np.einsum("ij,abjk,lk->abil", _DCT8, blocks, _DCT8)
        coefs.append(np.round(d / q).astype(np.int16))
    payload = zlib.compress(b"".join(c.tobytes() for c in coefs), 6)
    return _LOSSY_MAGIC + struct.pack("<HHf", w, h, q) + payload


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] != _LOSSY_MAGIC:
        raise ValueError("not a SLC1 payload")
    w, h, q = struct.unpack_from("<HHf", data, 4)
    raw = zlib.decompress(data[12:])
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    n = (ph // 8) * (pw // 8) * 64
    out = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        d = (
            np.frombuffer(raw, dtype=np.int16, count=n, offset=c * n * 2)
            .astype(np.float64)
            .reshape(ph // 8, pw // 8, 8, 8)
            * q
        )
        blocks = np.einsum("ji,abjk,kl->abil", _DCT8, d, _DCT8)
        chan = blocks.transpose(0, 2, 1, 3).reshape(ph, pw)
        out[:, :, c] = np.clip(np.round(chan + 128.0), 0, 255)[:h, :w]
    return out


# ---------------------------------------------------------------------------
# Generic encode/decode + metrics
# ---------------------------------------------------------------------------

def encode_image(px: np.ndarray, fmt: str) -> bytes:
    if fmt == "bmp":
        return encode_bmp(px)
    if fmt == "png":
        return encode_png(px)
    if fmt == "lossy":
        return encode_lossy(px)
    raise ValueError(f"unknown fmt {fmt}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "lossy":
        return decode_lossy(data)
    raise ValueError(f"unknown fmt {fmt}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 * 255.0 / mse))


def resize_block_mean(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area-style resize via index-binned means (the
    thumbnail analog of se/document_meta.py:87-91, PIL-free)."""
    h, w = gray.shape
    ys = (np.arange(h) * out_h // h).clip(max=out_h - 1)
    xs = (np.arange(w) * out_w // w).clip(max=out_w - 1)
    out = np.zeros((out_h, out_w), dtype=np.float64)
    cnt = np.zeros((out_h, out_w), dtype=np.int64)
    np.add.at(out, (ys[:, None], xs[None, :]), gray.astype(np.float64))
    np.add.at(cnt, (ys[:, None], xs[None, :]), 1)
    return out / np.maximum(cnt, 1)


_DCT32 = _dct_matrix(32)


def phash64(px: np.ndarray) -> int:
    """Perceptual hash: gray → 32x32 block-mean resize → 2-D DCT → low
    8x8 coefficients (minus DC) thresholded at their median → 64-bit int
    (two's complement signed, matching the corpus `phash:int64` column)."""
    gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = resize_block_mean(gray, 32, 32)
    d = _DCT32 @ small @ _DCT32.T
    low = d[:8, :8].flatten()
    low[0] = 0.0
    med = np.median(low[1:])
    bits = (low > med).astype(np.uint64)
    val = np.uint64(0)
    for bit in bits:
        val = (val << np.uint64(1)) | bit
    return int(val.astype(np.int64))


# ---------------------------------------------------------------------------
# Spark plumbing: Arrow-batched decode + stats (mapInPandas generator).
# Input batches carry (image_id, bytes, w, h, fmt, caption, phash);
# output adds decode_ok, psnr_db, phash_check, thumb_mean.
# ---------------------------------------------------------------------------

DECODE_STATS_SCHEMA = (
    "image_id string, fmt string, decode_ok boolean, width int, height int, "
    "psnr_db double, phash_computed bigint, phash_match boolean, thumb_mean double"
)


def _reference_psnr(image_id: str, px: np.ndarray, w, h) -> float | None:
    """PSNR of the decoded pixels against the deterministic reference
    render (image_id 'img-<i>' encodes the render index) — the north
    rule's decoded-pixel invariant (PSNR ≥ 40 dB for lossy formats).
    Exact round-trips report 99.0 (capped); unknown ids → None."""
    try:
        i = int(image_id.rsplit("-", 1)[-1])
    except (ValueError, AttributeError):
        return None
    if w is None or h is None or pd.isna(w) or pd.isna(h):
        return None
    ref = render_pattern(i, int(w), int(h))
    if ref.shape != px.shape:
        return None
    val = psnr(px, ref)
    return 99.0 if val == float("inf") else float(val)


def decode_stats_map_in_pandas(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: decode every payload, recompute phash, measure
    PSNR against the deterministic reference render when (image_id, w, h)
    identify one.  One python loop per Arrow batch — vectorized numpy
    inside."""
    for pdf in batches:
        rows = []
        for image_id, data, w, h, fmt, expected_phash in zip(
            pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"], pdf["phash"]
        ):
            try:
                px = decode_image(bytes(data), fmt)
                ph = phash64(px)
                gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                thumb = resize_block_mean(gray, 10, 16)
                rows.append(
                    {
                        "image_id": image_id,
                        "fmt": fmt,
                        "decode_ok": True,
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "psnr_db": _reference_psnr(image_id, px, w, h),
                        "phash_computed": ph,
                        "phash_match": ph == expected_phash,
                        "thumb_mean": float(thumb.mean()),
                    }
                )
            except Exception:
                rows.append(
                    {
                        "image_id": image_id,
                        "fmt": fmt,
                        "decode_ok": False,
                        "width": None,
                        "height": None,
                        "psnr_db": None,
                        "phash_computed": None,
                        "phash_match": False,
                        "thumb_mean": None,
                    }
                )
        # dtype=object first: None rows must not coerce int64 → float64
        # (float64 corrupts low bits of 64-bit phashes); Int64-from-object
        # is exact
        out = pd.DataFrame(rows, dtype=object)
        for col in ("width", "height", "phash_computed"):
            out[col] = out[col].astype("Int64")
        out["psnr_db"] = out["psnr_db"].astype("float64")
        out["thumb_mean"] = out["thumb_mean"].astype("float64")
        out["decode_ok"] = out["decode_ok"].astype("bool")
        out["phash_match"] = out["phash_match"].astype("bool")
        yield out
