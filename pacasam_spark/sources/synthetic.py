"""Deterministic synthetic patch-catalogue generator.

Re-expresses the reference's SyntheticConnector
(reference: connectors/synthetic.py:45-113) as lazy DataFrame ops over
``spark.range`` — no cross join needed (the grid is arithmetic on the row
index), no driver-side numpy, no RNG state: every value is a pure function
of patch_id via the portable hash (operators/hashing.py).

Semantics preserved:
- grid: g = ceil(sqrt(db_size)); patch i at x=(i // g)*50, y=(i % g)*50,
  box = (x, y, x+50, y+50)  (reference: synthetic.py:92-111)
- file_id = "{x//1000}_{y//1000}" slab id  (reference: synthetic.py:112)
- boolean descriptors with EXACT prevalence counts: the reference shuffles
  a vector with ceil(prevalence*n) ones (synthetic.py:71-75); here the rows
  ranked in the top ceil(p*n) by det_hash(patch_id, seed_col) are true —
  exact count, seeded positions, order-independent.
- nb_* uniform integers in [0, 60000)  (reference: synthetic.py:77-79)
- `test` flag: exactly floor(0.2*n) rows true, rest NULL (NaN=>train
  semantics, reference: synthetic.py:84-89, connectors/lipac.py:126-136)

Scale note: exact-count descriptor assignment is a BUCKET-DECOMPOSED rank
(no global window): global_rank(h) = cum_count(buckets below h's bucket)
+ rank_within_bucket(h), where the bucket is the hash's high 15 bits.
The per-bucket cumulative counts come from a 32k-row histogram (its
cumulative window is unpartitioned but TINY — same documented shape as
sampling._hash_threshold_trim), broadcast back; the within-bucket rank is
a window PARTITIONED by bucket — ~N/32768 rows per partition, fully
distributed at any N. The threshold approximation
``det_uniform(id, seed) < p`` (exact in expectation, zero extra shuffles)
remains as exact_counts=False for the biggest fixtures.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pacasam_spark import schemas as S
from pacasam_spark.operators.hashing import det_hash, det_int, det_uniform

DEFAULT_PREVALENCES = {"C0": 0.005, "C1": 0.2, "C2": 0.2, "C3": 0.7}
NB_MAX = 60000
TEST_FRAC = 0.2

_HASH_BUCKET = 1 << 16  # det_hash range [0, 2^31) -> 32768 buckets


def _exact_topk_flag(df: DataFrame, base: DataFrame, name: str, h, k: int) -> DataFrame:
    """``name`` = True for the k rows ranked lowest by (h, patch_id) —
    identical to a global ``row_number() <= k`` but with NO global
    window: the global rank decomposes into the cumulative count of
    lower hash-buckets (32k-row broadcast histogram) plus the rank
    inside the row's own bucket (window partitioned by bucket).

    The histogram is built from ``base`` (the bare id range), NOT from
    the accumulated ``df``: the hash is a pure function of patch_id, and
    deriving each histogram from the growing flag chain would make every
    later histogram recompute the whole prefix of joins and windows."""
    b = (h / _HASH_BUCKET).cast("long")
    hist = base.select(b.alias("__b")).groupBy("__b").count()
    # unpartitioned cumulative over <= 32768 histogram rows — documented
    # tiny-table exception (same as sampling._hash_threshold_trim)
    wc = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "__b", F.coalesce(F.sum("count").over(wc), F.lit(0)).alias("__cum")
    )
    wr = Window.partitionBy("__b").orderBy(h, F.col(S.PATCH_ID))
    return (
        df.withColumn("__b", b)
        .join(F.broadcast(cum), "__b")
        .withColumn(name, (F.col("__cum") + F.row_number().over(wr)) <= k)
        .drop("__b", "__cum")
    )


def synthetic_catalogue(
    spark: SparkSession,
    db_size: int = 10000,
    prevalences: dict[str, float] | None = None,
    seed: int = 42,
    exact_counts: bool = True,
) -> DataFrame:
    """Build the catalogue as a lazy DataFrame. Columns per
    :func:`pacasam_spark.schemas.catalogue_schema`."""
    if prevalences is None:
        prevalences = DEFAULT_PREVALENCES
    g = math.ceil(math.sqrt(db_size))

    base = spark.range(db_size).withColumnRenamed("id", S.PATCH_ID)
    df = base
    pid = F.col(S.PATCH_ID)
    x = (pid / g).cast("long") * S.PATCH_SIZE_M
    y = F.pmod(pid, F.lit(g)) * S.PATCH_SIZE_M
    df = (
        df.withColumn("geom_xmin", x.cast("double"))
        .withColumn("geom_ymin", y.cast("double"))
        .withColumn("geom_xmax", (x + S.PATCH_SIZE_M).cast("double"))
        .withColumn("geom_ymax", (y + S.PATCH_SIZE_M).cast("double"))
        .withColumn(
            S.FILE_ID,
            F.concat(
                (x / S.TILE_SIZE_M).cast("long").cast("string"),
                F.lit("_"),
                (y / S.TILE_SIZE_M).cast("long").cast("string"),
            ),
        )
        .withColumn(S.SRID, F.lit(S.DEFAULT_SRID).cast("int"))
    )

    for i, (name, p) in enumerate(sorted(prevalences.items())):
        k = math.ceil(p * db_size)
        col_seed = seed * 1000 + i
        if exact_counts:
            df = _exact_topk_flag(df, base, name, det_hash(pid, col_seed), k)
        else:
            df = df.withColumn(name, det_uniform(pid, col_seed) < p)

    for j, name in enumerate(S.NB_POINT_COLS):
        df = df.withColumn(name, det_int(pid, 0, NB_MAX, seed * 2000 + j))

    n_test = int(TEST_FRAC * db_size)
    if exact_counts:
        df = _exact_topk_flag(
            df, base, "__is_test", det_hash(pid, seed * 3000), n_test
        )
        is_test = F.col("__is_test")
    else:
        is_test = det_uniform(pid, seed * 3000) < TEST_FRAC
    df = df.withColumn(S.TEST_FLAG, F.when(is_test, F.lit(True)))  # else NULL
    return df.drop("__is_test")


def synthetic_catalogue_sql(db_size: int = 10000, seed: int = 42) -> str:
    """The equivalent ANSI SQL (DuckDB-compatible) for oracle checks.

    Mirrors :func:`synthetic_catalogue` with exact_counts=True.
    """
    from pacasam_spark.operators.hashing import det_hash_sql, det_int_sql

    g = math.ceil(math.sqrt(db_size))
    prevalences = sorted(DEFAULT_PREVALENCES.items())
    desc_cols = []
    for i, (name, p) in enumerate(prevalences):
        k = math.ceil(p * db_size)
        h = det_hash_sql("patch_id", seed * 1000 + i)
        desc_cols.append(
            f"(row_number() over (order by {h}, patch_id)) <= {k} as {name}"
        )
    nb_cols = [
        f"cast({det_int_sql('patch_id', 0, NB_MAX, seed * 2000 + j)} as bigint)"
        f" as {name}"
        for j, name in enumerate(S.NB_POINT_COLS)
    ]
    n_test = int(TEST_FRAC * db_size)
    h_test = det_hash_sql("patch_id", seed * 3000)
    test_col = (
        f"case when (row_number() over (order by {h_test}, patch_id))"
        f" <= {n_test} then true end as test"
    )
    return f"""
    with ids as (select range as patch_id from range({db_size})),
    grid as (
      select patch_id,
             cast((patch_id // {g}) * {S.PATCH_SIZE_M} as double) as geom_xmin,
             cast((patch_id % {g}) * {S.PATCH_SIZE_M} as double) as geom_ymin
      from ids
    )
    select patch_id,
           concat(cast(cast(floor(geom_xmin / {S.TILE_SIZE_M}) as bigint) as varchar),
                  '_',
                  cast(cast(floor(geom_ymin / {S.TILE_SIZE_M}) as bigint) as varchar))
             as file_id,
           geom_xmin, geom_ymin,
           geom_xmin + {S.PATCH_SIZE_M} as geom_xmax,
           geom_ymin + {S.PATCH_SIZE_M} as geom_ymax,
           cast({S.DEFAULT_SRID} as integer) as srid,
           {', '.join(desc_cols)},
           {', '.join(nb_cols)},
           {test_col}
    from grid
    """
