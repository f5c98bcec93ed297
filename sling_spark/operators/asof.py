"""As-of (point-in-time) join operators.

Spark has no native ASOF JOIN (the guide's classic gap). Two
implementations with different scale trade-offs:

- **window_asof**: when both sides share a partition key and the "right"
  side can be unioned in (sparse events), a single window pass with
  last_value(ignorenulls) gives each left row the most recent right
  value — one shuffle, no join at all. Used for same-table as-of
  ("latest prior signup per event").
- **merge_asof_join**: general two-table as-of via applyInPandas per
  key group running pandas.merge_asof — for modest per-key cardinality
  (bucketize the time axis first at 100 TB scale).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def window_asof(
    df: DataFrame,
    key: str,
    time_col: str,
    mark_col,
    value_col,
    out_col: str = "asof_value",
    tiebreak: str | None = None,
) -> DataFrame:
    """For every row, the most recent ``value_col`` (at or before the
    row's time) among rows satisfying ``mark_col`` — per ``key``.

    ``mark_col``: boolean Column marking "right side" rows;
    ``value_col``: Column to carry. One window, one shuffle."""
    order = [F.asc(time_col)] + ([F.asc(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marked = F.when(mark_col, value_col)
    return df.withColumn(out_col, F.last(marked, ignorenulls=True).over(w))


def merge_asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    direction: str = "backward",
) -> DataFrame:
    """General as-of join per key group via pandas.merge_asof."""
    l_cols = left.columns
    r_cols = [c for c in right.columns if c not in (key, time_col)]
    overlap = sorted(set(l_cols) & set(r_cols))
    if overlap:
        # pandas.merge_asof would _x/_y-suffix these and the projection
        # below would KeyError per group — fail loudly up front instead
        raise ValueError(
            f"merge_asof_join: right payload columns {overlap} collide "
            "with left columns; rename them before joining"
        )
    # single filtered field list: a payload-less right table must not
    # leave a dangling ', ' in the DDL string
    fields = list(left.schema.fields) + [
        f for f in right.schema.fields if f.name in r_cols
    ]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)

    lt = left.withColumn("__side", F.lit(0))
    rt = right.withColumn("__side", F.lit(1))
    both = lt.unionByName(rt, allowMissingColumns=True)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = pdf[pdf["__side"] == 0][l_cols].sort_values(time_col)
        rpdf = pdf[pdf["__side"] == 1][[key, time_col, *r_cols]].sort_values(time_col)
        if lpdf.empty:
            return pd.DataFrame(columns=l_cols + r_cols)
        merged = pd.merge_asof(
            lpdf, rpdf.drop(columns=[key]), on=time_col, direction=direction
        )
        return merged[l_cols + r_cols]

    return both.groupBy(key).applyInPandas(run, schema=schema)
