"""Adaptive recrawl schedule parity: dt evolution 1h→2h→3h(cap) on
unchanged content, halving with floor on change (se/document.py:696-712,
golden sequence se/test_crawl.py:292-335)."""

from datetime import datetime

from pyspark.sql import functions as F

from sosse_spark.operators.recrawl import schedule_next_cols

T = datetime(2024, 1, 1, 12, 0, 0)
H = 3600


def _apply(spark, rows, freq, changed_flags, dt_min=H, dt_max=3 * H):
    df = spark.createDataFrame(
        [(T, dt, ch) for dt, ch in zip(rows, changed_flags)],
        "crawl_last timestamp, crawl_dt long, changed boolean",
    )
    nxt, dt = schedule_next_cols(F.col("changed"), freq, dt_min, dt_max)
    return df.select(nxt.alias("crawl_next"), dt.alias("crawl_dt")).collect()


def test_none(spark):
    out = _apply(spark, [None], "none", [False])
    assert out[0]["crawl_next"] is None and out[0]["crawl_dt"] is None


def test_constant(spark):
    out = _apply(spark, [None, 7200], "constant", [False, True])
    for r in out:
        assert r["crawl_next"] == datetime(2024, 1, 1, 13, 0, 0)
        assert r["crawl_dt"] is None


def test_adaptive_golden_sequence(spark):
    """First crawl → dt_min; unchanged doubles to cap; changed halves to floor."""
    out = _apply(
        spark,
        [None, H, 2 * H, 3 * H, 3 * H, 2 * H, H],
        "adaptive",
        [False, False, False, False, True, True, True],
    )
    dts = [r["crawl_dt"] for r in out]
    assert dts == [H, 2 * H, 3 * H, 3 * H, int(1.5 * H), H, H]
    assert out[0]["crawl_next"] == datetime(2024, 1, 1, 13, 0, 0)
    assert out[1]["crawl_next"] == datetime(2024, 1, 1, 14, 0, 0)
