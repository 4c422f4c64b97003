"""Snapshot/time-travel storage contract (sources/snapshots.py):
atomic commit, uncommitted writes invisible, per-file lineage in
every manifest, expire keeps history."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pacasam_spark.sources.snapshots import (
    expire_snapshots,
    read_snapshot,
    snapshots,
    write_snapshot,
)


def test_snapshot_versions_and_time_travel(spark, tmp_path):
    d = str(tmp_path / "tbl")
    df1 = spark.range(10).select(F.col("id").alias("patch_id"))
    df2 = spark.range(25).select(F.col("id").alias("patch_id"))
    assert write_snapshot(df1, d, {"seed": 1}) == 1
    assert write_snapshot(df2, d, {"seed": 2}) == 2

    assert read_snapshot(spark, d).count() == 25  # latest
    assert read_snapshot(spark, d, version=1).count() == 10  # time travel

    hist = snapshots(d)
    assert [m["version"] for m in hist] == [1, 2]
    assert hist[0]["parent_version"] is None
    assert hist[1]["parent_version"] == 1
    assert hist[1]["row_count"] == 25
    assert hist[1]["metadata"] == {"seed": 2}
    # per-file lineage: keyed by committed part-file basename, sums to
    # the total (writer-task layout, not read splits)
    assert sum(hist[1]["files"].values()) == 25
    data_dir = str(tmp_path / "tbl" / "v00002" / "data")
    on_disk = {f for f in os.listdir(data_dir) if f.endswith(".parquet")}
    assert set(hist[1]["files"]) <= on_disk
    # per-partition metrics ride the manifest: actual on-disk bytes,
    # keyed like the lineage
    assert set(hist[1]["file_bytes"]) == set(hist[1]["files"])
    for name, nbytes in hist[1]["file_bytes"].items():
        assert nbytes == os.path.getsize(os.path.join(data_dir, name))
        assert nbytes > 0


def test_snapshot_uncommitted_write_is_invisible(spark, tmp_path):
    """A killed writer leaves data without a manifest: readers skip it,
    the next writer takes a fresh version number."""
    d = str(tmp_path / "tbl")
    write_snapshot(spark.range(5), d)
    # simulate a crash: v2 data written, no manifest
    crashed = os.path.join(d, "v00002", "data")
    spark.range(99).write.parquet(crashed)

    assert read_snapshot(spark, d).count() == 5  # still v1
    assert [m["version"] for m in snapshots(d)] == [1]
    with pytest.raises(FileNotFoundError, match="never committed"):
        read_snapshot(spark, d, version=2)
    # next commit does NOT collide with the orphaned v2 dir
    v = write_snapshot(spark.range(7), d)
    assert v == 3
    assert read_snapshot(spark, d).count() == 7


def test_snapshot_expire_keeps_manifests(spark, tmp_path):
    d = str(tmp_path / "tbl")
    for n in (3, 6, 9):
        write_snapshot(spark.range(n), d)
    assert expire_snapshots(d, keep_last=1) == [1, 2]
    # history still inspectable, data of the survivor still readable
    assert [m["row_count"] for m in snapshots(d)] == [3, 6, 9]
    assert read_snapshot(spark, d).count() == 9
    with pytest.raises(FileNotFoundError, match="expired"):
        read_snapshot(spark, d, version=1)


def test_snapshot_empty_table_errors(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="no committed"):
        read_snapshot(spark, str(tmp_path / "nope"))
