"""Feature normalization (SURVEY.md §2.11 M1/M2).

Reference semantics (samplers/algos.py:64-91):
1. zeros -> NaN (ignored by the statistics),
2. standardization (x-mean)/(std+1e-5) with SAMPLE std, or quantile
   transform to uniform [0,1],
3. NaN -> per-column min of the normalized values (0 if all were zero).

Spark design: two aggregate passes (stats, then mins of the normalized
values) broadcast back as literals — no shuffle of the data itself, all
column arithmetic stays in whole-stage codegen. The quantile variant builds
a per-column grid with ``approxQuantile`` (exact at relativeError=0) and
interpolates in a vectorized pandas UDF (the only Python hop, Arrow-batched).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pacasam_spark.operators.filters import assert_no_nan

EPSILON = 1e-5  # reference: samplers/algos.py:14 (EPSILON = 10e-6)


def standardize(df: DataFrame, columns: list[str], check_nan: bool = True) -> DataFrame:
    """M1: zero-ignoring standardization with min-fill."""
    if check_nan:
        assert_no_nan(df, columns)

    masked = {c: F.nullif(F.col(c).cast("double"), F.lit(0.0)) for c in columns}
    # Order-independent statistics: float avg()/stddev() results depend on
    # partition merge order (non-associative fp addition), which would make
    # the downstream FPS selection vary with cluster size. DECIMAL sums are
    # exact, so mean/std are bitwise identical at any parallelism.
    dec = "decimal(38,6)"
    stats_row = df.agg(
        *[F.sum(masked[c].cast(dec)).alias(f"sum_{c}") for c in columns],
        *[F.sum((masked[c] * masked[c]).cast(dec)).alias(f"ssq_{c}") for c in columns],
        *[F.count(masked[c]).alias(f"cnt_{c}") for c in columns],
    ).first()

    normed = df
    for c in columns:
        n = stats_row[f"cnt_{c}"]
        if not n:  # all zeros: normalized value is NULL -> filled below
            normed = normed.withColumn(c, F.lit(None).cast("double"))
            continue
        s, ssq = float(stats_row[f"sum_{c}"]), float(stats_row[f"ssq_{c}"])
        mean = s / n
        var = (ssq - n * mean * mean) / (n - 1) if n > 1 else 0.0
        std = var**0.5 if var > 0 else 0.0
        normed = normed.withColumn(
            c, (masked[c] - F.lit(mean)) / F.lit(std + EPSILON)
        )

    mins_row = normed.agg(*[F.min(c).alias(f"min_{c}") for c in columns]).first()
    for c in columns:
        fill = mins_row[f"min_{c}"]
        fill = 0.0 if fill is None else fill
        normed = normed.withColumn(c, F.coalesce(F.col(c), F.lit(fill)))
    return normed


def quantile_transform(
    df: DataFrame,
    columns: list[str],
    n_quantiles: int = 50,
    check_nan: bool = True,
) -> DataFrame:
    """M2: empirical-CDF transform to uniform [0,1], zero-ignoring, min-fill.

    Mirrors sklearn's QuantileTransformer grid+interp shape
    (reference: samplers/algos.py:84-85) without the library: the grid is
    ``n_quantiles`` exact quantiles of the non-zero values; values map by
    linear interpolation. Deterministic — no subsample cap needed at our
    scale (the reference caps at 100k rows).
    """
    if check_nan:
        assert_no_nan(df, columns)

    masked = df.select(
        *[F.nullif(F.col(c).cast("double"), F.lit(0.0)).alias(c) for c in columns]
    )
    probs = list(np.linspace(0.0, 1.0, n_quantiles))
    grids = masked.approxQuantile(columns, probs, 0.0)  # exact
    grid_by_col = dict(zip(columns, grids))

    out_fields = ", ".join(
        f"{f.name} double" if f.name in columns else f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
    )

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        refs = np.linspace(0.0, 1.0, n_quantiles)
        for pdf in batches:
            for c in columns:
                grid = np.asarray(grid_by_col[c], dtype=float)
                v = pdf[c].astype(float).to_numpy()
                nonzero = v != 0.0
                res = np.full(len(v), np.nan)
                if grid.size:
                    res[nonzero] = np.interp(v[nonzero], grid, refs[: grid.size])
                pdf[c] = res
            yield pdf

    normed = df.mapInPandas(transform, schema=out_fields)
    mins_row = normed.agg(
        *[F.min(F.when(~F.isnan(c), F.col(c))).alias(f"min_{c}") for c in columns]
    ).first()
    for c in columns:
        fill = mins_row[f"min_{c}"]
        fill = 0.0 if fill is None else fill
        normed = normed.withColumn(
            c, F.when(F.isnan(c), F.lit(fill)).otherwise(F.col(c))
        )
    return normed
