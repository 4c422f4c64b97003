"""Deterministic exact-n sampling operators (SURVEY.md §2.11 M6/M7, §4.3-1).

The reference's sampling uses pandas ``.sample(random_state=0)`` plus a
driver while-loop to hit exact counts (reference: samplers/algos.py:17-56).
Here every draw is ordered by the portable hash of the row key, which makes
the operators:

- exact-n (rank <= k, not fraction-based like ``df.sample``),
- deterministic across partitionings/cluster sizes,
- single-pass (the reference's completion while-loop collapses into a
  round-robin rank — see :func:`sample_with_stratification`),
- ANSI-SQL expressible for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pacasam_spark import schemas as S
from pacasam_spark.operators.hashing import det_hash


def sample_randomly(
    df: DataFrame, n: int, seed: int = 0, key: str = S.PATCH_ID
) -> DataFrame:
    """M6: seeded no-replacement sample of min(n, count) rows
    (reference: samplers/algos.py:17-20).

    Physical plan: TakeOrdered(n) — per-partition top-n then driver merge;
    no global sort, no full shuffle. Scales to any input size for
    reasonable n.
    """
    return df.orderBy(det_hash(key, seed), F.col(key)).limit(n)


def sample_n_per_stratum(
    df: DataFrame,
    n_per_stratum: int,
    keys: list[str],
    seed: int = 0,
    id_key: str = S.PATCH_ID,
) -> DataFrame:
    """A2: exact n-per-group sample via window rank
    (reference: samplers/algos.py:36-37)."""
    w = Window.partitionBy(*keys).orderBy(det_hash(id_key, seed), F.col(id_key))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def sample_with_stratification(
    df: DataFrame,
    num_to_sample: int,
    keys: str | list[str] = S.FILE_ID,
    seed: int = 0,
    id_key: str = S.PATCH_ID,
    distributed_trim_threshold: int = 20000,
) -> DataFrame:
    """M7: exact-n sample stratified by ``keys``
    (reference: samplers/algos.py:23-56).

    The reference does floor(n/strata) per stratum (with replacement +
    dedup) then a driver while-loop adding 1 per stratum until n is
    reached. Both phases collapse into one ROUND-ROBIN rank: order rows by
    (rank within stratum, hash) and take the first n. Every stratum
    contributes min(size, fair share), the total is exactly
    min(n, count(df)), and there is no driver loop.

    Physical plan: one shuffle for the per-stratum window (partitioned by
    the strata keys — salt upstream if a stratum is hot, though strata are
    ~400 patches in the reference data model). The global cut is
    TakeOrdered(n) for small n; for large n that merge is a serial
    driver bottleneck, so the cut switches to a distributed
    round-threshold trim (identical result, see
    :func:`_round_threshold_trim`).
    """
    if isinstance(keys, str):
        keys = [keys]
    h = det_hash(id_key, seed)
    w = Window.partitionBy(*keys).orderBy(h, F.col(id_key))
    ranked = df.withColumn("__rk", F.row_number().over(w))
    if num_to_sample <= distributed_trim_threshold:
        return (
            ranked.orderBy(F.col("__rk"), h, F.col(id_key))
            .limit(num_to_sample)
            .drop("__rk")
        )
    return _round_threshold_trim(ranked, num_to_sample, keys, h, id_key)


def _round_threshold_trim(ranked, num_to_sample, keys, h, id_key):
    """Take the first n rows of the (round, hash) order WITHOUT a global
    TakeOrdered: find the largest full round r with
    sum(min(count_s, r)) <= n via binary search over the (tiny) per-strata
    counts table, keep every row with rank <= r (a filter), and fill the
    remainder from the boundary round r+1 ordered by hash (a TakeOrdered
    of at most #strata rows). Identical to orderBy(rank, hash).limit(n).
    """
    counts = ranked.groupBy(*keys).agg(F.count("*").alias("__c")).persist()
    max_round_row = counts.agg(
        F.max("__c").alias("mx"), F.sum("__c").alias("total")
    ).first()
    max_round, total = int(max_round_row["mx"] or 0), int(max_round_row["total"] or 0)
    if total <= num_to_sample:
        counts.unpersist()
        return ranked.drop("__rk")

    def taken_at(r: int) -> int:
        return int(
            counts.agg(F.sum(F.least(F.col("__c"), F.lit(r)))).first()[0] or 0
        )

    lo, hi = 0, max_round  # invariant: taken_at(lo) <= n < taken_at(hi + 1)
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if taken_at(mid) <= num_to_sample:
            lo = mid
        else:
            hi = mid - 1
    r = lo
    remaining = num_to_sample - taken_at(r)
    counts.unpersist()

    base = ranked.filter(F.col("__rk") <= r)
    if remaining == 0:
        return base.drop("__rk")
    boundary = (
        ranked.filter(F.col("__rk") == r + 1)
        .orderBy(h, F.col(id_key))
        .limit(remaining)
    )
    return base.unionByName(boundary).drop("__rk")


def stratified_sample_sql(
    source_sql: str,
    num_to_sample: int,
    keys: list[str],
    seed: int = 0,
    id_key: str = S.PATCH_ID,
    columns: str = "*",
) -> str:
    """DuckDB/ANSI oracle text for :func:`sample_with_stratification`."""
    from pacasam_spark.operators.hashing import det_hash_sql

    h = det_hash_sql(id_key, seed)
    part = ", ".join(keys)
    return f"""
    with ranked as (
      select {columns},
             row_number() over (partition by {part}
                                order by {h}, {id_key}) as __rk
      from ({source_sql})
    )
    select * exclude (__rk) from ranked
    order by __rk, {h}, {id_key}
    limit {num_to_sample}
    """


def top_k(df: DataFrame, order_col, k: int) -> DataFrame:
    """O3: global top-k (reference: samplers/outliers.py:46).
    Physical plan: TakeOrdered — no global sort."""
    return df.orderBy(F.desc(order_col) if isinstance(order_col, str) else order_col).limit(k)
