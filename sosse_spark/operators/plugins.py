"""P15/P16: config-driven per-mimetype document mutators.

The reference runs per-mimetype shell scripts whose JSON output
overwrites document fields (MimePlugin.run_for_document,
se/mime_plugin.py, hook se/document.py:518), and collection-defined JS
whose returned object does the same via a serializer
(se/collection.py:202-207, se/document.py:512-516).  Neither a shell
fork per document nor a browser JS engine belongs in a Spark stage; the
portable semantics is "rows whose mimetype matches a pattern pass
through a user function that may overwrite a declared set of columns".

Spark shape: ONE ``mapInPandas`` pass over the parse output — plugins
run executor-side on Arrow batches (vectorized, no per-row Python
dispatch), rows that match no plugin stream through untouched, and the
schema is fixed up-front so the stage composes with the rest of the
crawl pipeline.  Plugin transforms must be deterministic pure functions
of the batch (no wall clock, no I/O) to keep crawl replay exact.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["MimePlugin", "apply_mime_plugins"]


@dataclass(frozen=True)
class MimePlugin:
    """One plugin: rows with mimetype matching `mimetype_re` pass through
    `transform`, whose returned frame overwrites `writes` columns
    (the reference's field-overwrite contract, se/mime_plugin.py)."""

    name: str
    mimetype_re: str
    transform: Callable[[pd.DataFrame], pd.DataFrame]
    writes: tuple[str, ...]


def apply_mime_plugins(
    df: DataFrame, plugins: list[MimePlugin], mimetype_col: str = "mimetype"
) -> DataFrame:
    """Run every plugin over its matching rows in one mapInPandas pass.

    Plugins apply in list order (a later plugin sees the earlier one's
    writes — matching the reference's sequential plugin loop).  Output
    schema == input schema: plugins may only overwrite existing columns,
    never add or drop them.
    """
    schema = df.schema
    names = set(schema.fieldNames())
    for p in plugins:
        missing = set(p.writes) - names
        if missing:
            raise ValueError(f"plugin {p.name} writes unknown columns {sorted(missing)}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        compiled = [(re.compile(p.mimetype_re), p) for p in plugins]
        for pdf in batches:
            if pdf.empty:
                yield pdf
                continue
            for rex, p in compiled:
                mask = pdf[mimetype_col].fillna("").map(lambda s: bool(rex.search(s)))
                if not mask.any():
                    continue
                out = p.transform(pdf.loc[mask].copy())
                if len(out) != int(mask.sum()):
                    raise ValueError(f"plugin {p.name} changed row count")
                for c in p.writes:
                    pdf.loc[mask, c] = out[c].values
            yield pdf

    return df.mapInPandas(run, schema)
