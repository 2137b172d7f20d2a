"""Codec round-trips, PSNR gate, phash stability (FIXTURES.md §1;
the per-row invariant from BASELINE.json input_hint)."""

import numpy as np
import pytest

from sosse_spark.functions.images import (
    decode_image,
    encode_image,
    phash64,
    psnr,
    render_pattern,
    resize_block_mean,
)


@pytest.mark.parametrize("i,w,h", [(0, 16, 16), (1, 32, 24), (2, 64, 48), (7, 17, 13)])
def test_lossless_roundtrip(i, w, h):
    px = render_pattern(i, w, h)
    for fmt in ("bmp", "png"):
        assert np.array_equal(decode_image(encode_image(px, fmt), fmt), px)


@pytest.mark.parametrize("i,w,h", [(0, 16, 16), (3, 32, 24), (11, 64, 48), (7, 17, 13)])
def test_lossy_psnr_gate(i, w, h):
    px = render_pattern(i, w, h)
    out = decode_image(encode_image(px, "lossy"), "lossy")
    assert psnr(px, out) >= 40.0


def test_phash_deterministic_and_sensitive():
    a = render_pattern(5, 32, 24)
    assert phash64(a) == phash64(a.copy())
    b = render_pattern(6, 32, 24)
    assert phash64(a) != phash64(b)
    # phash survives the lossy codec (perceptually identical image)
    rt = decode_image(encode_image(a, "lossy"), "lossy")
    assert bin(phash64(a) ^ phash64(rt)).count("1") <= 4


def test_phash_int64_range():
    v = phash64(render_pattern(2, 64, 48))
    assert -(2**63) <= v < 2**63


def test_resize_block_mean():
    gray = np.arange(64, dtype=np.float64).reshape(8, 8)
    out = resize_block_mean(gray, 4, 4)
    assert out.shape == (4, 4)
    assert abs(out.mean() - gray.mean()) < 1e-9


def test_decode_stats_spark(spark):
    """The mapInPandas decode stage: schema, batch shape, phash parity."""
    from sosse_spark.functions.images import DECODE_STATS_SCHEMA, decode_stats_map_in_pandas
    from sosse_spark.sources.corpus import corpus_df

    df = corpus_df(spark, 30, partitions=4)
    stats = df.mapInPandas(decode_stats_map_in_pandas, DECODE_STATS_SCHEMA)
    rows = stats.collect()
    assert len(rows) == 30
    assert all(r["decode_ok"] for r in rows)
    assert all(r["phash_match"] for r in rows)
