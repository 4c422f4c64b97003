"""As-of (nearest-value) join (SURVEY.md §2.4 J8, §2.6 W1).

The reference's ingest SQL picks, per vignette, the ortho vintage whose
year is nearest the lidar year:
ROW_NUMBER() OVER (PARTITION BY id ORDER BY ABS(a-b)) ... WHERE rank = 1
(reference: configs/Lipac_query.sql:121-132).

Spark has no native as-of join; the canonical mapping is equi-join on the
partition key + window rank-1 on the distance. For a pure time-series
as-of (sorted merge), ``merge_asof_groups`` gives the
``applyInPandas``/pd.merge_asof variant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_value: str,
    right_value: str,
    tiebreak: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join and keep, per left row-group key, the right row minimizing
    |left_value - right_value|. Deterministic via explicit tiebreak cols.
    """
    keys = [on] if isinstance(on, str) else list(on)
    joined = left.join(right, on=keys, how=how)
    dist: Column = F.abs(F.col(left_value) - F.col(right_value))
    order = [dist] + [F.col(c) for c in (tiebreak or [right_value])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_asof_groups(
    left: DataFrame,
    right: DataFrame,
    by: str | list[str],
    on: str,
    direction: str = "backward",
    tolerance=None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Sorted-merge as-of join per group (the pd.merge_asof variant the
    module docstring promises; DuckDB twin: ASOF JOIN).

    For each left row, attach the right row of the same ``by`` group
    whose ``on`` value is the nearest at-or-before it (``backward``; or
    at-or-after with ``forward``). Unmatched left rows keep NULL right
    columns (left-join semantics — like pd.merge_asof, unlike
    :func:`asof_nearest_join`'s inner equi-join + window).

    Physical plan: ONE cogroup shuffle on ``by`` then a vectorized
    pandas sorted-merge per group — O(n log n) in the group, no
    group-wide cross join, no window. The right side is deduplicated to
    one row per (group, on) (keep first by the remaining columns) so the
    match is deterministic under any partitioning.

    Right columns other than ``by``/``on`` must not collide with left
    column names (pre-rename on the caller side).
    """
    import pandas as pd

    keys = [by] if isinstance(by, str) else list(by)
    extra = [c for c in right.columns if c not in set(keys) | {on}]
    left_schema = left.schema
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left_schema.fields]
        + [
            f"{f.name} {f.dataType.simpleString()}"
            for f in right.schema.fields
            if f.name in extra
        ]
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=list(lpdf.columns) + extra)
        lpdf = lpdf.sort_values(on, kind="mergesort").reset_index(drop=True)
        if rpdf.empty:
            out = lpdf.copy()
            for c in extra:
                out[c] = None
            return out
        rpdf = (
            rpdf.sort_values([on] + extra, kind="mergesort")
            .drop_duplicates(on, keep="first")
            .reset_index(drop=True)
        )
        return pd.merge_asof(
            lpdf,
            rpdf[[on] + extra],
            on=on,
            direction=direction,
            tolerance=tolerance,
            allow_exact_matches=allow_exact_matches,
        )

    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(lambda l, r: merge(l, r), schema=out_schema)
    )


def distinct_on(
    df: DataFrame, keys: list[str], order_by: list[str]
) -> DataFrame:
    """W2: Postgres DISTINCT ON (keys) ... ORDER BY — keep first row per
    key group (reference: configs/Lipac_query.sql:80-94)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
