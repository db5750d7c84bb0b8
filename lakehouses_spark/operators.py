"""Reusable DataFrame operators that compose into pipelines (SURVEY §2.3).

`asof_join` — the JVM path (union + last-over-window, one shuffle) lives in
queries/timeseries.py::ts_asof_join. This module adds the cogrouped-pandas
variant: per-key `pd.merge_asof` via `groupBy().cogroup().applyInPandas`,
the implementation the operator table reserves for semantics built-ins can't
express (tolerance windows, nearest-direction, multi-column by). Use the
JVM path when plain backward as-of is enough; this one when you need
merge_asof's full parameter surface.

Scaling: cogroup shuffles both sides once on the key; each pandas call sees
ONE key's rows (bounded state), Arrow both ways.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    tolerance: str | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """As-of join with pandas merge_asof semantics, distributed per `by` key.

    left/right must share the `by` (entity) and `on` (event-time) columns;
    every other right column lands with `suffix` when it collides.
    """
    r_cols = [c for c in right.columns if c not in (on, by)]
    out_fields = [left.schema[c] for c in left.columns]
    renames = {}
    for c in r_cols:
        out_name = c + suffix if c in left.columns else c
        renames[c] = out_name
        f = right.schema[c]
        out_fields.append(f.__class__(out_name, f.dataType, True))
    from pyspark.sql.types import StructType

    out_schema = StructType(out_fields)
    tol = pd.Timedelta(tolerance) if tolerance else None
    left_cols = list(left.columns)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        lpdf = lpdf.sort_values(on)
        if rpdf.empty:
            for c, out_name in renames.items():
                lpdf[out_name] = None
            return lpdf[[f.name for f in out_fields]]
        rpdf = rpdf.sort_values(on).rename(columns=renames)
        merged = pd.merge_asof(
            lpdf,
            rpdf.drop(columns=[by]),
            on=on,
            tolerance=tol,
            direction=direction,
        )
        return merged[[f.name for f in out_fields]]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(lambda l, r: merge(l, r), out_schema)
    )


def zscore_pandas(df: DataFrame, by: str, value_col: str = "value",
                  out_col: str = "zscore") -> DataFrame:
    """GROUPED_MAP applyInPandas: per-group standardization in one pandas
    call per group. The JVM window expression (queries/relational.py::
    window_zscore) is the engine path; this exists for transforms that
    genuinely need whole-group pandas semantics (rank-based normalization,
    per-group model fits) and is equivalence-tested against the window form."""
    import numpy as np

    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, DoubleType(), True)])

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype(float)
        sd = v.std(ddof=1)
        pdf[out_col] = (v - v.mean()) / sd if sd and not np.isnan(sd) else None
        return pdf

    return df.groupBy(by).applyInPandas(standardize, out_schema)


def top_k_per_group(df: DataFrame, group_cols: Iterable[str], order_col: str,
                    k: int, descending: bool = True) -> DataFrame:
    """The W1 pattern as a reusable operator (row_number ≤ k per group)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    order = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(*group_cols).orderBy(order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )
