"""JDBC / PostGIS scan (SURVEY.md §2.1 S1).

The reference streams a server-side SQL result in 100k-row chunks into
pandas (connectors/lipac.py:73-94) — a single-machine workaround for
memory. The Spark-native equivalent is a PARTITIONED JDBC read: the
server evaluates the same SQL, and Spark fetches partitions in parallel
across executors (partitionColumn/lowerBound/upperBound/numPartitions
replace the chunk loop).

No JDBC driver jar ships in this container, so this module is exercised
by unit tests only up to option construction; on a cluster, add
``--jars postgresql-*.jar``.
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
