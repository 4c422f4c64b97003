"""Bucketed catalogue storage (SURVEY.md §2.1 S3 scale path; BENCH.md
"bucketed-catalogue option").

The DiversitySampler pipeline shuffles the full catalogue twice: once on
``file_id`` for the chunk-rank window, once on ``__chunk_id`` for the
per-chunk FPS. Writing the catalogue ONCE bucketed by ``file_id``
(Spark's ``bucketBy`` — the bucket id is encoded in each file name, so
the scan reports ``HashPartitioning(file_id)``) removes the first
shuffle for *every* subsequent sampling run: ``Window.partitionBy
(file_id)`` and ``groupBy(file_id)`` are satisfied by the scan's
partitioning and Catalyst plans no Exchange before them. At 10^12 rows
that is the difference between re-shuffling ~100 TB per run and
shuffling it once at ingest.

This is the plain-parquet analogue of an Iceberg table with a
``bucket(N, file_id)`` partition transform (the north-rule storage
layout); no Iceberg runtime exists in this image, so the bucketing
metadata lives in the session catalog instead of a table format.
Because the default session catalog is in-memory, a SECOND session can
adopt an already-written bucketed directory with
``register_bucketed_catalogue`` — a ``CREATE TABLE ... CLUSTERED BY``
DDL over the existing files (bucket ids are recovered from file names,
no data rewrite).

Reference: the pacasam catalogue is a single GeoPackage read whole into
pandas (connectors/geopandas.py:24-31); layout-aware storage is the
Spark-native replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pacasam_spark import schemas as S

DEFAULT_BUCKETS = 32


def write_bucketed_catalogue(
    df: DataFrame,
    name: str,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    bucket_key: str = S.FILE_ID,
    sort_keys: tuple[str, ...] = (S.FILE_ID, S.PATCH_ID),
) -> DataFrame:
    """Write ``df`` as an external parquet table bucketed by
    ``bucket_key`` and per-file sorted by ``sort_keys``; returns the
    table-backed DataFrame.

    ``n_buckets`` bounds the parallelism of shuffle-free stages reading
    the table — size it to the cluster (total cores to a small multiple
    of them), not to the data.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        # Pre-shuffle onto the bucket hash (repartition's HashPartitioning
        # and bucketBy share partitionIdExpression = pmod(murmur3, n)) so
        # every write task holds exactly ONE bucket and each bucket is
        # exactly ONE file. With >1 file per bucket Spark discards the
        # SORTED BY metadata at scan time (the merge order across files
        # is unknown) and re-sorts under every window; with one file the
        # scan reports outputOrdering = sort_keys and the per-file rank
        # window runs sort-free. Measured at 80M rows: the rank stage's
        # per-bucket sort disappears from the plan entirely.
        df.repartition(n_buckets, F.col(bucket_key))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_key)
        .sortBy(*sort_keys)
        .option("path", path)
        .saveAsTable(name)
    )
    return spark.table(name)


def register_bucketed_catalogue(
    spark: SparkSession,
    name: str,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    bucket_key: str = S.FILE_ID,
    sort_keys: tuple[str, ...] = (S.FILE_ID, S.PATCH_ID),
) -> DataFrame:
    """Adopt an existing bucketed directory into THIS session's catalog
    (the in-memory catalog forgets tables between JVMs; the files do
    not). Schema is taken from the parquet footers; bucket membership is
    recovered from the ``_00000``-style bucket suffix Spark wrote into
    each file name. The DDL must match the writer's layout — same
    ``n_buckets`` and keys — or bucket pruning would lie; keep the
    parameters with the dataset.
    """
    schema_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in spark.read.parquet(path).schema.fields
    )
    sort_ddl = ", ".join(f"`{k}`" for k in sort_keys)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} ({schema_ddl}) USING parquet "
        f"CLUSTERED BY (`{bucket_key}`) SORTED BY ({sort_ddl}) "
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )
    return spark.table(name)
