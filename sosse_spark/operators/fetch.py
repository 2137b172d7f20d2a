"""Fetch stage: Arrow-batched deterministic fetcher (BrowserMock analog).

Reference parity:
  * redirect following with max_redirects=5 → TooManyRedirects
    (se/browser_request.py:190-239, sosse/conf.py:356-360)
  * page-size guard → PageTooBig (se/browser_request.py:146-165)
  * per-host session reuse — one session per hostname
    (se/browser_request.py:115-144) ≙ executor-local dict living across
    Arrow batches inside one mapInPandas task
  * error capture → error text + md5 hash (se/document.py:579-584)

The fetcher is a pure function of the URL (webgraph.fetch_sim + corpus
render) so crawl runs are exactly reproducible — the analog of
se/test_mock.py's URL→bytes map, at any scale, with zero stored state.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sosse_spark.functions.images import encode_image, phash64, render_pattern
from sosse_spark.functions.images import decode_image
from sosse_spark.sources.corpus import caption_for, dims_for, fmt_for, image_id_for
from sosse_spark.sources.webgraph import (
    WebConfig,
    favicon_of,
    fetch_sim,
    max_age_of,
    robots_body,
)
from sosse_spark.operators.robots import robots_rules_rows

__all__ = [
    "FETCH_SCHEMA",
    "fetch_batch",
    "fetch_robots_for_domains",
    "fetch_favicons_for_domains",
]

FETCH_SCHEMA = (
    "url string, final_url string, redirect_count int, error string, "
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash bigint, links array<string>, max_age bigint"
)


def fetch_batch(claimed: DataFrame, cfg: WebConfig) -> DataFrame:
    """mapInPandas over the claimed batch; emits payload + raw hrefs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sessions: dict[str, int] = {}  # per-host session reuse analog
        for pdf in batches:
            rows = []
            for url in pdf["url"]:
                host = url.split("/", 3)[2] if url.startswith("http") else ""
                sessions[host] = sessions.get(host, 0) + 1
                res = fetch_sim(url, cfg)
                row = {
                    "url": url,
                    "final_url": res.final_url,
                    "redirect_count": res.redirect_count,
                    "error": res.error,
                    "image_id": None,
                    "bytes": None,
                    "w": None,
                    "h": None,
                    "fmt": None,
                    "caption": None,
                    "phash": None,
                    "links": res.links,
                    "max_age": None,
                }
                if res.error is None and res.doc_index is not None:
                    i = res.doc_index
                    w, h = dims_for(i)
                    fmt = fmt_for(i)
                    data = encode_image(render_pattern(i, w, h), fmt)
                    row.update(
                        image_id=image_id_for(i),
                        bytes=data,
                        w=w,
                        h=h,
                        fmt=fmt,
                        caption=caption_for(i),
                        phash=phash64(decode_image(data, fmt)),
                        max_age=max_age_of(i, cfg),
                    )
                rows.append(row)
            # CRITICAL: construct with dtype=object FIRST — a batch mixing
            # success rows with error/redirect rows (phash=None) would
            # otherwise coerce int64 → float64 at construction and silently
            # corrupt low bits of large phashes; Int64 cast from object is
            # exact.
            out = pd.DataFrame(rows, dtype=object)
            for col in ("phash", "w", "h", "redirect_count", "max_age"):
                out[col] = out[col].astype("Int64")
            yield out

    return claimed.select("url").mapInPandas(run, FETCH_SCHEMA)


ROBOTS_FETCH_SCHEMA = "domain string, kind string, pattern string, pattern_len int"


def fetch_robots_for_domains(domains: DataFrame, cfg: WebConfig) -> DataFrame:
    """Fetch+parse robots.txt for each new domain (se/domain.py:175-191);
    distributed — one Arrow batch of domains in, rules rows out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for domain in pdf["url_domain"]:
                try:
                    host = int(domain.split(".")[0].removeprefix("img"))
                except ValueError:
                    host = -1
                body = robots_body(host, cfg) if host >= 0 else None
                rows.extend(robots_rules_rows(domain, body))
            yield pd.DataFrame(rows, columns=["domain", "kind", "pattern", "pattern_len"])

    return domains.select("url_domain").distinct().mapInPandas(run, ROBOTS_FETCH_SCHEMA)


FAVICON_FETCH_SCHEMA = (
    "domain string, favicon_url string, mimetype string, missing boolean, content_len int"
)


def fetch_favicons_for_domains(domains: DataFrame, cfg: WebConfig) -> DataFrame:
    """Fetch /favicon.ico once per new domain (P8: FavIcon.extract,
    se/models.py:383-440 — url-unique cache, `missing` flag on 404).
    Same distributed shape as the robots fetch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for domain in pdf["url_domain"]:
                try:
                    host = int(domain.split(".")[0].removeprefix("img"))
                except ValueError:
                    host = -1
                fav = favicon_of(host, cfg) if host >= 0 else None
                if fav is None:
                    rows.append(
                        {
                            "domain": domain,
                            "favicon_url": f"http://{domain}/favicon.ico",
                            "mimetype": None,
                            "missing": True,
                            "content_len": None,
                        }
                    )
                else:
                    data = encode_image(render_pattern(fav, 16, 16), "png")
                    rows.append(
                        {
                            "domain": domain,
                            "favicon_url": f"http://{domain}/favicon.ico",
                            "mimetype": "image/png",
                            "missing": False,
                            "content_len": len(data),
                        }
                    )
            out = pd.DataFrame(rows, dtype=object)
            out["content_len"] = out["content_len"].astype("Int64")
            out["missing"] = out["missing"].astype("bool")
            yield out

    return domains.select("url_domain").distinct().mapInPandas(run, FAVICON_FETCH_SCHEMA)
