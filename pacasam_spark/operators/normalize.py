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
interpolates with pure fold/element_at expressions (:func:`interp_expr`) —
also codegen, no Python hop, and text-identical to the DuckDB oracle twin.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pacasam_spark.operators.filters import assert_no_nan

EPSILON = 1e-5  # reference: samplers/algos.py:14 (EPSILON = 10e-6)


_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def _stat_partial_aggs(types: dict, masked: dict, columns: list[str]) -> list:
    """The per-column aggregation expressions of :func:`standardize` —
    every one is decomposable (sum/count/min), so the same list serves
    the single global agg AND the per-file grouped agg of the fused
    pass (whose partials then merge exactly on the tiny per-file
    table)."""
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
    return aggs


_SPLIT = 1 << 31  # hi/lo split base for the fast long-sum path


def _hi_lo(v):
    """Exact (hi, lo) split of a long column: lo = pmod(v, 2^31) in
    [0, 2^31), hi = (v - lo) / 2^31 — the division is exact (v - lo is a
    multiple of 2^31 and the quotient fits double's 53-bit mantissa), so
    hi * 2^31 + lo == v for either sign."""
    lo = F.pmod(v, F.lit(_SPLIT))
    hi = ((v - lo) / F.lit(_SPLIT)).cast("long")
    return hi, lo


def _stat_partials_fast(
    types: dict, masked: dict, columns: list[str]
) -> tuple[list, list]:
    """Split-long twin of :func:`_stat_partial_aggs` (guide §4.2 spirit —
    keep the hot loop out of per-row BigDecimal): decimal SUMS with
    precision > 18 aggregate through a JavaBigDecimal allocation per row
    (measured 1.84 s vs 0.19 s for plain long sums on a 6M-row column),
    so each decimal sum becomes long sums over the hi/lo split of the
    exactly scaled long value, and every per-row conversion is hoisted
    into a PROJECTION (returned first) so it runs once per row instead of
    once per aggregate expression referencing it. The decimal cast uses
    compact decimal(18,6) — long-backed, same rounding as the classic
    (38,6) cast for every |x| < 1e12, ANSI-raising beyond. Exactness: the
    scaled long derives from the same decimal cast as the classic path,
    the :func:`_hi_lo` split is exact for either sign, and long sums are
    exact — :func:`_stats_from_fast` reassembles identical statistics
    with unbounded Python ints. Overflow of any piece raises under ANSI
    mode and :func:`standardize` falls back to the classic decimal
    aggregation — loud recomputation, never silent corruption."""
    proj, aggs = [], []
    for c in columns:
        x = masked[c]
        proj += [
            x.alias(f"__m_{c}"),
            (F.col(c).isNull() | F.isnan(F.col(c).cast("double")))
            .cast("int")
            .alias(f"__isnan_{c}"),
        ]
        aggs += [
            F.count(f"__m_{c}").alias(f"cnt_{c}"),
            F.min(f"__m_{c}").alias(f"min_{c}"),
            F.sum(f"__isnan_{c}").alias(f"nan_{c}"),
        ]
        if types[c] in _INTEGRAL:
            xi = F.nullif(F.col(c).cast("long"), F.lit(0))
            proj += [xi.alias(f"__xi_{c}"), (xi * xi).alias(f"__q_{c}")]
            qhi, qlo = _hi_lo(F.col(f"__q_{c}"))
            aggs += [
                F.sum(f"__xi_{c}").alias(f"s_{c}"),
                F.sum(qhi).alias(f"ssqhi_{c}"),
                F.sum(qlo).alias(f"ssqlo_{c}"),
            ]
        else:
            # same element-level values as the classic path: the decimal
            # cast (and for ssq the double square) happens first, then
            # the exact scale-6 integer is taken apart into longs
            proj += [
                (x.cast("decimal(18,6)") * F.lit(1000000))
                .cast("long")
                .alias(f"__s6_{c}"),
                ((x * x).cast("decimal(18,6)") * F.lit(1000000))
                .cast("long")
                .alias(f"__q6_{c}"),
            ]
            shi, slo = _hi_lo(F.col(f"__s6_{c}"))
            qhi, qlo = _hi_lo(F.col(f"__q6_{c}"))
            aggs += [
                F.sum(shi).alias(f"shi_{c}"),
                F.sum(slo).alias(f"slo_{c}"),
                F.sum(qhi).alias(f"ssqhi_{c}"),
                F.sum(qlo).alias(f"ssqlo_{c}"),
            ]
    return proj, aggs


def _stat_merge_aggs_fast(types: dict, columns: list[str]) -> list:
    """Merge of :func:`_stat_partial_aggs_fast` partials: every part is a
    long sum (re-sum), mins re-min — exact, like the classic merge."""
    aggs = []
    for c in columns:
        aggs += [
            F.sum(f"cnt_{c}").alias(f"cnt_{c}"),
            F.min(f"min_{c}").alias(f"min_{c}"),
            F.sum(f"nan_{c}").alias(f"nan_{c}"),
        ]
        if types[c] in _INTEGRAL:
            aggs.append(F.sum(f"s_{c}").alias(f"s_{c}"))
        else:
            aggs += [
                F.sum(f"shi_{c}").alias(f"shi_{c}"),
                F.sum(f"slo_{c}").alias(f"slo_{c}"),
            ]
        aggs += [
            F.sum(f"ssqhi_{c}").alias(f"ssqhi_{c}"),
            F.sum(f"ssqlo_{c}").alias(f"ssqlo_{c}"),
        ]
    return aggs


def _stats_from_fast(row, types: dict, columns: list[str]) -> dict:
    """Reassemble the canonical ``cnt_/min_/nan_/s_/ssq_`` statistics from
    fast split-long partials with unbounded Python ints — numerically
    IDENTICAL to the classic decimal aggregation's values."""
    from decimal import Decimal

    out = {}
    for c in columns:
        out[f"cnt_{c}"] = row[f"cnt_{c}"]
        out[f"min_{c}"] = row[f"min_{c}"]
        out[f"nan_{c}"] = row[f"nan_{c}"]
        ssq_int = (row[f"ssqhi_{c}"] or 0) * _SPLIT + (row[f"ssqlo_{c}"] or 0)
        if types[c] in _INTEGRAL:
            out[f"s_{c}"] = row[f"s_{c}"]
            out[f"ssq_{c}"] = Decimal(ssq_int)
        else:
            s_int = (row[f"shi_{c}"] or 0) * _SPLIT + (row[f"slo_{c}"] or 0)
            out[f"s_{c}"] = Decimal(s_int).scaleb(-6)
            out[f"ssq_{c}"] = Decimal(ssq_int).scaleb(-6)
        if row[f"cnt_{c}"] == 0:
            # classic sums of an empty/all-NULL column are NULL, and
            # standardize's n==0 branch never reads them — mirror that
            out[f"s_{c}"] = None
            out[f"ssq_{c}"] = None
    return out


def _is_overflow_error(exc: Exception) -> bool:
    msg = str(exc)
    return (
        "ARITHMETIC_OVERFLOW" in msg
        or "CAST_OVERFLOW" in msg
        or "NUMERIC_VALUE_OUT_OF_RANGE" in msg
        or "overflow" in msg.lower()
    )


def _stat_merge_aggs(columns: list[str]) -> list:
    """Exact merge of per-file partials: counts/sums re-sum, mins re-min.
    Long and decimal sums are exact, so the merged statistics are
    bit-identical to the single-pass global aggregation — downstream FPS
    selections (and their golden checksums) cannot move."""
    aggs = []
    for c in columns:
        aggs += [
            F.sum(f"cnt_{c}").alias(f"cnt_{c}"),
            F.min(f"min_{c}").alias(f"min_{c}"),
            F.sum(f"nan_{c}").alias(f"nan_{c}"),
            F.sum(f"s_{c}").alias(f"s_{c}"),
            F.sum(f"ssq_{c}").alias(f"ssq_{c}"),
        ]
    return aggs


def standardize(
    df: DataFrame,
    columns: list[str],
    check_nan: bool = True,
    file_counts_key: str | None = None,
    stats: dict | None = None,
) -> DataFrame | tuple[DataFrame, DataFrame]:
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

    With ``file_counts_key``, the pass is grouped by that column and
    returns ``(normalized_df, counts_df)`` where ``counts_df`` is
    ``(file_counts_key, count)`` — the per-file count table chunked FPS
    needs. This FUSES the Diversity pipeline's two catalogue scans
    (normalize stats + groupBy(file).count) into one: the grouped agg
    is still a partial-agg map-side combine, its output is one row per
    file (thousands for billions of patches), and the global statistics
    are merged from those partials with exact arithmetic — bit-identical
    results, one fewer full-data read (round-5 verdict: the stats agg is
    the memory-bandwidth-bound stage that caps single-box scaling).

    With ``stats``, the aggregation pass is SKIPPED entirely: the caller
    supplies the merged statistics (keys ``cnt_<c>/min_<c>/nan_<c>/
    s_<c>/ssq_<c>``, the shape :func:`_stat_merge_aggs` produces and
    ``sources.snapshots.snapshot_fps_inputs`` reads back from snapshot
    manifests) and this function only builds the transform expressions —
    ZERO scans, the manifest-fed path that makes the Diversity pipeline
    a single-scan job over a snapshot-table catalogue."""
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    masked = {c: F.nullif(F.col(c).cast("double"), F.lit(0.0)) for c in columns}

    counts = None
    if stats is not None:
        if file_counts_key is not None:
            raise ValueError(
                "stats= supplies precomputed statistics; the fused "
                "file_counts_key pass has nothing to aggregate — get the "
                "counts table from the same source as the stats"
            )
    elif file_counts_key is None:
        proj, fast_aggs = _stat_partials_fast(types, masked, columns)
        try:
            row = df.select(*proj).agg(*fast_aggs).first()
            stats = _stats_from_fast(row, types, columns)
        except Exception as e:  # ANSI overflow -> exact decimal fallback
            if not _is_overflow_error(e):
                raise
            stats = df.agg(*_stat_partial_aggs(types, masked, columns)).first()
    else:
        # the FPS quota/skew scalars (total rows, max per-file count) ride
        # the same merge job and are stamped on the counts DataFrame, so
        # fps_sample runs NO aggregation job of its own (same values)
        fps_totals = [
            F.sum("count").alias("__total"),
            F.max("count").alias("__mx"),
        ]
        proj, fast_aggs = _stat_partials_fast(types, masked, columns)
        try:
            per_file = (
                df.select(file_counts_key, *proj)
                .groupBy(file_counts_key)
                .agg(F.count("*").alias("count"), *fast_aggs)
                .persist()
            )
            row = per_file.agg(
                *_stat_merge_aggs_fast(types, columns), *fps_totals
            ).first()
            stats = _stats_from_fast(row, types, columns)
        except Exception as e:
            if not _is_overflow_error(e):
                raise
            per_file.unpersist()
            per_file = (
                df.groupBy(file_counts_key)
                .agg(
                    F.count("*").alias("count"),
                    *_stat_partial_aggs(types, masked, columns),
                )
                .persist()
            )
            row = per_file.agg(*_stat_merge_aggs(columns), *fps_totals).first()
            stats = row
        counts = per_file.select(file_counts_key, "count")
        counts._pacasam_totals = (int(row["__total"] or 0), int(row["__mx"] or 0))

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
    return normed if counts is None else (normed, counts)


def interp_expr(v, grid: list[float], refs: list[float]):
    """Piecewise-linear interpolation of ``v`` onto (grid -> refs) as a
    pure column expression (whole-stage codegen — no Python hop). Clamps
    outside the grid; NULL passes through. :func:`interp_sql` is the
    text-identical DuckDB twin, so results are bitwise equal."""
    garr = F.array(*[F.lit(float(g)) for g in grid])
    rarr = F.array(*[F.lit(float(r)) for r in refs])
    idx = F.size(F.filter(garr, lambda g: g <= v))  # grid values <= v
    lo, hi = F.element_at(garr, idx), F.element_at(garr, idx + F.lit(1))
    rlo, rhi = F.element_at(rarr, idx), F.element_at(rarr, idx + F.lit(1))
    res = rlo + (v - lo) * (rhi - rlo) / (hi - lo)
    return (
        F.when(v.isNull(), F.lit(None).cast("double"))
        .when(v <= F.lit(float(grid[0])), F.lit(float(refs[0])))
        .when(v >= F.lit(float(grid[-1])), F.lit(float(refs[-1])))
        .otherwise(res)
    )


def interp_sql(v: str, grid: list[float], refs: list[float]) -> str:
    """DuckDB twin of :func:`interp_expr` (same expression tree)."""
    glist = "[" + ", ".join(repr(float(g)) for g in grid) + "]"
    rlist = "[" + ", ".join(repr(float(r)) for r in refs) + "]"
    idx = f"len(list_filter({glist}, g -> g <= {v}))"
    lo, hi = f"list_extract({glist}, {idx})", f"list_extract({glist}, {idx} + 1)"
    rlo, rhi = f"list_extract({rlist}, {idx})", f"list_extract({rlist}, {idx} + 1)"
    res = f"{rlo} + ({v} - {lo}) * ({rhi} - {rlo}) / ({hi} - {lo})"
    return (
        f"(case when {v} is null then null"
        f" when {v} <= {float(grid[0])!r} then {float(refs[0])!r}"
        f" when {v} >= {float(grid[-1])!r} then {float(refs[-1])!r}"
        f" else {res} end)"
    )


def quantile_transform(
    df: DataFrame,
    columns: list[str],
    n_quantiles: int = 50,
    check_nan: bool = True,
    grids: dict[str, list[float]] | None = None,
    file_counts_key: str | None = None,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """M2: empirical-CDF transform to uniform [0,1], zero-ignoring, min-fill.

    Mirrors sklearn's QuantileTransformer grid+interp shape
    (reference: samplers/algos.py:84-85) without the library: the grid is
    ``n_quantiles`` exact quantiles of the non-zero values (or caller-
    supplied ``grids``); values map by linear interpolation computed as
    PURE column expressions — whole-stage codegen, no Python hop, and
    ANSI-SQL expressible for the oracle (driver q42). Deterministic — no
    subsample cap needed at our scale (the reference caps at 100k rows).

    With ``file_counts_key``, the min-fill pass is grouped by that column
    and ``(normalized_df, counts_df)`` is returned — same fusion as
    :func:`standardize`: the per-file count table chunked FPS needs rides
    the aggregation this transform already pays for (min of per-file mins
    is exact, so values are unchanged).
    """
    if check_nan:
        assert_no_nan(df, columns)

    masked = {c: F.nullif(F.col(c).cast("double"), F.lit(0.0)) for c in columns}
    if grids is None:
        mdf = df.select(*[masked[c].alias(c) for c in columns])
        probs = list(np.linspace(0.0, 1.0, n_quantiles))
        grids = dict(zip(columns, mdf.approxQuantile(columns, probs, 0.0)))

    normed = df
    for c in columns:
        grid = [float(x) for x in grids[c]]
        if not grid:  # all zeros -> all NULL -> fill 0 (algos.py:89)
            normed = normed.withColumn(c, F.lit(0.0))
            continue
        refs = list(np.linspace(0.0, 1.0, len(grid)))
        normed = normed.withColumn(c, interp_expr(masked[c], grid, refs))

    min_aggs = [F.min(c).alias(f"min_{c}") for c in columns]
    counts = None
    if file_counts_key is None:
        mins_row = normed.agg(*min_aggs).first()
    else:
        per_file = (
            normed.groupBy(file_counts_key)
            .agg(F.count("*").alias("count"), *min_aggs)
            .persist()
        )
        mins_row = per_file.agg(
            *[F.min(f"min_{c}").alias(f"min_{c}") for c in columns],
            F.sum("count").alias("__total"),
            F.max("count").alias("__mx"),
        ).first()
        counts = per_file.select(file_counts_key, "count")
        # same contract as the standardize fused path: FPS scalars ride
        # the merge job, fps_sample skips its own aggregation
        counts._pacasam_totals = (
            int(mins_row["__total"] or 0),
            int(mins_row["__mx"] or 0),
        )
    for c in columns:
        fill = mins_row[f"min_{c}"]
        normed = normed.withColumn(
            c, F.coalesce(F.col(c), F.lit(0.0 if fill is None else float(fill)))
        )
    return normed if counts is None else (normed, counts)
