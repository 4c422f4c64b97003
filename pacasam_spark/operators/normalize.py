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


_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def standardize(df: DataFrame, columns: list[str], check_nan: bool = True) -> DataFrame:
    """M1: zero-ignoring standardization with min-fill — ONE aggregation
    pass over the data.

    Order-independent statistics: float avg()/stddev() depend on partition
    merge order (non-associative fp addition), which would make downstream
    FPS selections vary with cluster size. Exact sums instead:

    - integral columns: plain long sum (exact to ~10^12 rows of 32-bit
      values) + DECIMAL(38,0) sum of exact long squares;
    - float columns: DECIMAL(38,6) sums (slower but exact).

    The NaN guard and the min-fill value ride the same pass: the transform
    is monotonic, so min(normalized) == normalize(min(masked)).
    """
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    masked = {c: F.nullif(F.col(c).cast("double"), F.lit(0.0)) for c in columns}

    aggs = []
    for c in columns:
        x = masked[c]
        aggs += [
            F.count(x).alias(f"cnt_{c}"),
            F.min(x).alias(f"min_{c}"),
            F.sum(
                (F.col(c).isNull() | F.isnan(F.col(c).cast("double"))).cast("int")
            ).alias(f"nan_{c}"),
        ]
        if types[c] in _INTEGRAL:
            xi = F.nullif(F.col(c).cast("long"), F.lit(0))
            aggs += [
                F.sum(xi).alias(f"s_{c}"),
                F.sum((xi * xi).cast("decimal(38,0)")).alias(f"ssq_{c}"),
            ]
        else:
            dec = "decimal(38,6)"
            aggs += [
                F.sum(x.cast(dec)).alias(f"s_{c}"),
                F.sum((x * x).cast(dec)).alias(f"ssq_{c}"),
            ]
    stats = df.agg(*aggs).first()

    if check_nan:
        bad = [c for c in columns if stats[f"nan_{c}"]]
        if bad:
            raise UnexpectedNaNValuesError(
                f"NaN/NULL values in feature columns: {bad}"
            )

    normed = df
    for c in columns:
        n = stats[f"cnt_{c}"]
        if not n:  # all zeros -> all NULL -> fill 0 (reference algos.py:89)
            normed = normed.withColumn(c, F.lit(0.0))
            continue
        s = float(stats[f"s_{c}"])
        ssq = float(stats[f"ssq_{c}"])
        mean = s / n
        var = (ssq - n * mean * mean) / (n - 1) if n > 1 else 0.0
        std = var**0.5 if var > 0 else 0.0
        fill = (stats[f"min_{c}"] - mean) / (std + EPSILON)
        normed = normed.withColumn(
            c,
            F.coalesce((masked[c] - F.lit(mean)) / F.lit(std + EPSILON), F.lit(fill)),
        )
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
