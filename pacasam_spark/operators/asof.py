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
