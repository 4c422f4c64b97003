"""Z-order clustering + manifest-stats file pruning
(spatial/zorder.py, sources/snapshots.py):

- the Morton column expression is bit-identical to the Python twin,
  including negative cell coordinates;
- a z-ordered snapshot answers a box query from a small fraction of its
  files with EXACTLY the rows of a full scan (pruning is result-
  preserving), while the same data written in hash order prunes
  (almost) nothing — the layout, not the stats machinery, is what buys
  the skip;
- missing stats and all-pruned queries behave conservatively/safely.
"""

import random

import pytest
from pyspark.sql import functions as F

from pacasam_spark.sources.snapshots import (
    prune_files,
    read_snapshot,
    snapshots,
    write_snapshot,
)
from pacasam_spark.spatial.zorder import (
    cluster_by_zorder,
    morton_key,
    morton_key_py,
    zorder_key,
)


def test_morton_expression_matches_python_twin(spark):
    rng = random.Random(7)
    rows = [
        (rng.randint(-(1 << 30), (1 << 30) - 1), rng.randint(-(1 << 30), (1 << 30) - 1))
        for _ in range(500)
    ] + [(0, 0), (-1, -1), (1, 0), (0, 1), ((1 << 30) - 1, -(1 << 30))]
    df = spark.createDataFrame(rows, "cx long, cy long")
    got = df.select("cx", "cy", morton_key(F.col("cx"), F.col("cy")).alias("m")).collect()
    for r in got:
        assert r["m"] == morton_key_py(r["cx"], r["cy"]), (r["cx"], r["cy"])
        assert r["m"] >= 0


def test_morton_orders_by_cell_locality(spark):
    """Within one 2^k-aligned square, all keys precede every key of the
    next square up the curve — the property range-partitioning uses."""
    pts = [(cx, cy) for cx in range(8) for cy in range(8)]
    keys = {p: morton_key_py(*p) for p in pts}
    quad0 = [keys[(cx, cy)] for cx in range(4) for cy in range(4)]
    quad3 = [keys[(cx, cy)] for cx in range(4, 8) for cy in range(4, 8)]
    assert max(quad0) < min(quad3)
    assert len(set(keys.values())) == len(pts)  # injective


@pytest.fixture(scope="module")
def spatial_df(spark):
    # 20k points over a 40km x 40km extent, level-0 cells = 1 km
    return (
        spark.range(20_000)
        .select(
            F.col("id").alias("patch_id"),
            (F.pmod(F.xxhash64("id", F.lit(1)), 40_000_000) / 1000.0).alias("x"),
            (F.pmod(F.xxhash64("id", F.lit(2)), 40_000_000) / 1000.0).alias("y"),
        )
        .cache()
    )


BOX = {"x": (3_000.0, 6_000.0), "y": (11_000.0, 14_000.0)}  # 3km x 3km


def _box_rows(df):
    return sorted(
        r["patch_id"]
        for r in df.filter(
            F.col("x").between(*BOX["x"]) & F.col("y").between(*BOX["y"])
        ).collect()
    )


def test_zordered_snapshot_prunes_files_exactly(spark, tmp_path, spatial_df):
    d = str(tmp_path / "ztbl")
    write_snapshot(
        cluster_by_zorder(spatial_df, "x", "y", n_files=32),
        d,
        {"layout": "zorder"},
        stats_columns=["x", "y"],
    )
    manifest = snapshots(d)[-1]
    assert len(manifest["files"]) == 32
    assert set(manifest["file_stats"]) == set(manifest["files"])

    kept = prune_files(manifest, BOX)
    # the box is (3/40)^2 = 0.56% of the extent; z-order packs each file
    # into a compact square, so only the files whose square touches the
    # box survive — a handful, not the fleet
    assert 0 < len(kept) <= 8, kept

    pruned = read_snapshot(spark, d, bounds=BOX)
    files_read = {
        r["f"]
        for r in pruned.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert len(files_read) == len(kept)
    # result-preserving: exact filter over the pruned read == full scan
    assert _box_rows(pruned) == _box_rows(read_snapshot(spark, d))
    assert len(_box_rows(pruned)) > 0


def test_unclustered_layout_prunes_nothing(spark, tmp_path, spatial_df):
    """Same rows, hash-shuffled placement: every file's bbox spans the
    whole extent, so the same stats machinery keeps (nearly) all files —
    the skip above is earned by the layout."""
    d = str(tmp_path / "htbl")
    write_snapshot(
        spatial_df.repartition(32, "patch_id"),
        d,
        {"layout": "hash"},
        stats_columns=["x", "y"],
    )
    manifest = snapshots(d)[-1]
    kept = prune_files(manifest, BOX)
    assert len(kept) >= 30  # ~all 32
    # still exact, just not cheap
    assert _box_rows(read_snapshot(spark, d, bounds=BOX)) == _box_rows(
        read_snapshot(spark, d)
    )


def test_prune_is_conservative_without_stats(spark, tmp_path, spatial_df):
    d = str(tmp_path / "nostats")
    write_snapshot(spatial_df.repartition(4), d)  # no stats_columns
    manifest = snapshots(d)[-1]
    assert manifest["file_stats"] == {}
    assert prune_files(manifest, BOX) == sorted(manifest["files"])
    # bounds on a column with no recorded stats: all files kept
    d2 = str(tmp_path / "partial")
    write_snapshot(spatial_df.repartition(4), d2, stats_columns=["x"])
    m2 = snapshots(d2)[-1]
    assert prune_files(m2, {"y": (0.0, 1.0)}) == sorted(m2["files"])


def test_all_pruned_returns_empty_with_schema(spark, tmp_path, spatial_df):
    d = str(tmp_path / "ztbl2")
    write_snapshot(
        cluster_by_zorder(spatial_df, "x", "y", n_files=8),
        d,
        stats_columns=["x", "y"],
    )
    out = read_snapshot(spark, d, bounds={"x": (1e9, 2e9)})
    assert out.count() == 0
    assert out.schema == read_snapshot(spark, d).schema


def test_zorder_key_plan_is_codegen(spark, spatial_df):
    """The clustering key must stay JVM-side: no Python worker in the
    plan (BatchEvalPython/ArrowEvalPython would mean a UDF snuck in)."""
    plan = (
        spatial_df.select(zorder_key(F.col("x"), F.col("y")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
