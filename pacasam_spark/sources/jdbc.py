"""JDBC / PostGIS scan (SURVEY.md §2.1 S1).

The reference streams a server-side SQL result in 100k-row chunks into
pandas (connectors/lipac.py:73-94) — a single-machine workaround for
memory. The Spark-native equivalent is a PARTITIONED JDBC read: the
server evaluates the same SQL, and Spark fetches partitions in parallel
across executors (partitionColumn/lowerBound/upperBound/numPartitions
replace the chunk loop).

Executed LIVE in this container against embedded Apache Derby — the
database Spark already ships for its Hive metastore (jars/derby-*.jar):
tests/test_jdbc_live.py runs the partitioned scan end-to-end (writer,
bounded per-partition predicates, NULL/out-of-bounds routing, connector
-> sampler flow) and validates :func:`partition_ranges` against the
real engine's per-partition row counts. On a cluster, swap in
``--jars postgresql-*.jar`` + the PostGIS url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCH_SIZE = 100_000  # reference chunk size (lipac.py:35)


def jdbc_scan_options(
    url: str,
    sql: str,
    partition_column: str = "patch_id",
    num_partitions: int = 64,
    lower_bound: int = 0,
    upper_bound: int = 1 << 40,
    fetch_size: int = DEFAULT_FETCH_SIZE,
    **extra: str,
) -> dict[str, str]:
    """Build the option map for a partitioned JDBC read of a server-side
    query. The query runs once per partition with a bound predicate on
    ``partition_column`` — the distributed analogue of the reference's
    chunked fetch."""
    return {
        "url": url,
        "dbtable": f"({sql}) AS q",
        "partitionColumn": partition_column,
        "numPartitions": str(num_partitions),
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "fetchsize": str(fetch_size),
        **extra,
    }


def read_jdbc_catalogue(spark: SparkSession, **options: str) -> DataFrame:
    """S1: the partitioned scan. Dedup/sort from the reference ingest
    (lipac.py:90-91) is applied downstream by the caller
    (operators.filters.dedup_by_patch_id)."""
    return spark.read.format("jdbc").options(**options).load()


def rewrite_samba_paths(df: DataFrame, column: str = "file_path") -> DataFrame:
    """X3: //store.ign.fr/... -> /mnt/... path rewrite
    (reference: connectors/lipac.py:96-99)."""
    from pyspark.sql import functions as F

    return df.withColumn(
        column,
        F.regexp_replace(
            F.regexp_replace(column, r"^\\\\store\.ign\.fr\\", "/mnt/"),
            r"\\",
            "/",
        ),
    )


def _trunc_div(a: int, n: int) -> int:
    """Integer division truncating toward zero — Scala/Java ``Long``
    division, NOT Python's floor division (they differ for negative
    operands: -100 / 3 is -33 in Scala, -34 under Python ``//``)."""
    return a // n if (a >= 0) == (n >= 0) else -((-a) // n)


def partition_ranges(
    lower_bound: int, upper_bound: int, num_partitions: int
) -> list[tuple[int | None, int | None]]:
    """The [start, end) ranges a partitioned JDBC read generates — the
    same arithmetic as Spark's JDBCRelation.columnPartition: stride =
    upper / n - lower / n (each bound integer-divided BEFORE the
    subtraction, with Scala's truncate-toward-zero division so negative
    lower bounds mirror Spark exactly), partition 0 is open below (and
    picks up NULLs), the last is open above, interior partitions are
    half-open [start, start + stride). Open ends are None.

    Exposed so the partition layout is testable and inspectable WITHOUT
    a database connection (no driver jar ships in this container): the
    ranges must be non-overlapping and exhaustive — every value of the
    partition column, including values OUTSIDE [lower, upper), lands in
    exactly one partition, so a misconfigured bound skews partitions
    but never drops or duplicates rows."""
    if num_partitions <= 0:
        raise ValueError(f"num_partitions must be >= 1, got {num_partitions}")
    if lower_bound > upper_bound:
        raise ValueError(
            f"lower_bound {lower_bound} > upper_bound {upper_bound}"
        )
    # Spark clamps: at most (upper - lower) partitions, min 1
    n = min(num_partitions, max(upper_bound - lower_bound, 1))
    if n <= 1:
        return [(None, None)]
    stride = _trunc_div(upper_bound, n) - _trunc_div(lower_bound, n)
    ranges: list[tuple[int | None, int | None]] = []
    current = lower_bound + stride
    ranges.append((None, current))  # col < current OR col IS NULL
    for _ in range(1, n - 1):
        ranges.append((current, current + stride))
        current += stride
    ranges.append((current, None))  # col >= current
    return ranges
