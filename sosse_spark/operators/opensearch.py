"""OpenSearch Description import — sosse-admin load_se
(se/management/commands/load_se.py) + SearchEngine.parse_odf
(se/models.py:253-290).

The reference reads an `OpenSearchDescription` XML file and
update-or-creates a SearchEngine row keyed by ShortName:

- ShortName missing → the file is silently skipped (parse_odf's early
  return, se/models.py:258-260),
- LongName defaults to ShortName (se/models.py:266-271),
- `<Url type="text/html" template=...>` → html_template;
  `type="application/x-suggestions+json"` → suggestion_template
  (se/models.py:275-279),
- shortcut = first word of the lower-cased ShortName
  (se/models.py:281).

Here the parse is an Arrow mapInPandas kernel over a DataFrame of
descriptor payloads (stdlib ElementTree, the feedparse.py pattern), and
the update-or-create is a latest-wins MERGE on short_name.  Declared
delta: a descriptor without a Description element parses with
description NULL where the reference raises AttributeError.
"""

from __future__ import annotations

from typing import Iterator, Optional
from xml.etree import ElementTree

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "parse_odf",
    "parse_opensearch_batch",
    "load_search_engines",
    "update_builtin_rows",
    "conflicting_shortcuts",
    "OPENSEARCH_SCHEMA",
]

OPENSEARCH_SCHEMA = (
    "short_name string, long_name string, description string, "
    "html_template string, suggestion_template string, shortcut string"
)

_SUFFIX = "OpenSearchDescription"


def parse_odf(content: str) -> Optional[dict]:
    """Literal port of SearchEngine.parse_odf (se/models.py:253-283).
    Returns the engine fields, or None for non-descriptors / missing
    ShortName (the reference's skip arm)."""
    try:
        root = ElementTree.fromstring(content)
    except ElementTree.ParseError:
        return None
    if not root.tag.endswith(_SUFFIX):
        return None
    ns = root.tag[: -len(_SUFFIX)]
    short_name_elem = root.find(ns + "ShortName")
    if short_name_elem is None:
        return None
    short_name = short_name_elem.text
    long_name_elem = root.find(ns + "LongName")
    long_name = short_name if long_name_elem is None else long_name_elem.text
    desc_elem = root.find(ns + "Description")
    description = None if desc_elem is None else desc_elem.text
    html_template = None
    suggestion_template = None
    for elem in root.findall(ns + "Url"):
        if elem.get("type") == "text/html":
            html_template = elem.get("template")
        elif elem.get("type") == "application/x-suggestions+json":
            suggestion_template = elem.get("template")
    return {
        "short_name": short_name,
        "long_name": long_name,
        "description": description,
        "html_template": html_template,
        "suggestion_template": suggestion_template,
        "shortcut": (short_name or "").lower().split(" ")[0],
    }


def parse_opensearch_batch(df: DataFrame, content_col: str = "xml") -> DataFrame:
    """mapInPandas: descriptor payloads → one engine row each;
    non-descriptors and ShortName-less files contribute no rows."""
    import pandas as pd

    cols = [
        "short_name",
        "long_name",
        "description",
        "html_template",
        "suggestion_template",
        "shortcut",
    ]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for content in pdf[content_col]:
                row = parse_odf(content)
                if row is not None:
                    out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return df.select(content_col).mapInPandas(run, OPENSEARCH_SCHEMA)


def load_search_engines(engines: Optional[DataFrame], parsed: DataFrame) -> DataFrame:
    """update-or-create keyed by short_name (se/models.py:262-265 +
    :283 se.save()): a parsed row overwrites the existing engine with
    its ShortName, keeping the existing row's `enabled` flag; new names
    insert enabled.  Within one import batch the LAST occurrence of a
    short_name wins deterministically (ties broken by the full field
    tuple, since file order is not a DataFrame notion)."""
    w = Window.partitionBy("short_name").orderBy(
        F.col("_pref").desc(),
        F.col("html_template").desc_nulls_last(),
        F.col("long_name").desc_nulls_last(),
        F.col("description").desc_nulls_last(),
        F.col("suggestion_template").desc_nulls_last(),
        F.col("shortcut").desc_nulls_last(),
    )
    new = parsed.withColumn("_pref", F.lit(1))
    if engines is not None:
        keep_enabled = engines.select("short_name", "enabled")
        old = engines.drop("enabled").withColumn("_pref", F.lit(0))
        new = new.unionByName(old, allowMissingColumns=True)
    else:
        keep_enabled = None
    merged = (
        new.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_pref")
    )
    if keep_enabled is None:
        return merged.withColumn("enabled", F.lit(True))
    return merged.join(keep_enabled, "short_name", "left").withColumn(
        "enabled", F.coalesce(F.col("enabled"), F.lit(True))
    )


def update_builtin_rows(
    existing: Optional[DataFrame],
    items: DataFrame,
    lookup_field: str,
    preserve_fields: tuple = ("enabled",),
) -> DataFrame:
    """sosse-admin update_se / update_mime (UpdateBuiltinModel.handle,
    se/management/commands/builtin.py:30-68): merge source-tree builtin
    definitions into the config table —

    - a new lookup value inserts as-is (get_or_create defaults arm),
    - an existing USER-DEFINED row (builtin = false) is never touched
      (the skip warning arm, builtin.py:53-61),
    - an existing builtin row takes every item field EXCEPT
      `preserve_fields` ('enabled' always — the user's enable/disable
      choice survives updates, builtin.py:62-63; update_se adds
      'shortcut' to preserve user-assigned shortcuts).

    Output: the merged table plus an `action` column ∈ created /
    updated / skipped / kept — `kept` marks existing rows absent from
    the items batch, which pass through untouched (the reference only
    prints the created count).  Both sides are tiny config tables —
    pure broadcast-scale algebra."""
    if existing is None:
        out = items.withColumn("action", F.lit("created"))
        if "builtin" in items.columns:
            out = out.withColumn("builtin", F.coalesce(F.col("builtin"), F.lit(True)))
        else:
            out = out.withColumn("builtin", F.lit(True))
        return out
    item_cols = [c for c in items.columns if c != lookup_field]
    old_cols = [c for c in existing.columns if c != lookup_field]
    # deterministic output column order: item fields first, then
    # old-only fields
    ordered = item_cols + [c for c in old_cols if c not in item_cols]
    if "builtin" not in ordered:
        ordered.append("builtin")
    new_side = items.withColumn("_has_new", F.lit(True))
    old_side = existing.select(
        lookup_field, *[F.col(c).alias(f"_o_{c}") for c in old_cols]
    ).withColumn("_has_old", F.lit(True))
    j = new_side.join(old_side, lookup_field, "full")
    old_builtin = F.col("_o_builtin") if "builtin" in old_cols else F.lit(False)
    action = (
        F.when(F.col("_has_new").isNull(), F.lit("kept"))
        .when(F.col("_has_old").isNull(), F.lit("created"))
        .when(~F.coalesce(old_builtin, F.lit(False)), F.lit("skipped"))
        .otherwise(F.lit("updated"))
    )
    out_cols = [F.col(lookup_field)]
    for c in ordered:
        new_c = F.col(c) if c in item_cols else F.lit(None)
        old_c = F.col(f"_o_{c}") if c in old_cols else F.lit(None)
        if c == "builtin":
            # builtin-definition inserts ARE builtins; existing rows
            # keep their flag
            expr = F.when(action == "created", F.coalesce(new_c, F.lit(True))).otherwise(old_c)
        elif c in preserve_fields:
            expr = F.when(action == "created", new_c).otherwise(old_c)
        else:
            expr = F.when(action.isin("created", "updated"), new_c).otherwise(old_c)
        out_cols.append(expr.alias(c))
    return j.select(*out_cols, action.alias("action"))


def conflicting_shortcuts(engines: DataFrame) -> DataFrame:
    """Shortcuts claimed by more than one ENABLED engine
    (ConflictingSearchEngineFilter.conflicts, se/admin.py:212-219) —
    the update_se post-merge warning surface."""
    return (
        engines.filter(F.col("enabled"))
        .groupBy("shortcut")
        .agg(F.count("*").alias("shortcut_count"))
        .filter(F.col("shortcut_count") > 1)
    )
