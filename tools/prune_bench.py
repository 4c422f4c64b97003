"""Measure what Z-order + manifest pruning buys a box query at scale.

Three reads of the SAME 80M-row point table, same exact predicate,
same result checksum:

  A. z-ordered snapshot, read_snapshot(bounds=...)  — file pruning ON
  B. z-ordered snapshot, full read + filter         — layout only
     (parquet row-group min/max pushdown still applies, but every file
     is listed, opened, and footer-read, and every file becomes tasks)
  C. hash-layout snapshot, full read + filter       — the naive baseline

A/B isolates the manifest-pruning step; B/C isolates the layout's
row-group-skipping effect. At 100 TB, A is the only one that doesn't
schedule a task per data file.

Usage: python tools/prune_bench.py [n_rows] [n_files] [selectivity]
Prints one JSON line; caches the written tables under /tmp keyed by
(n_rows, n_files) so reruns only pay the reads.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pacasam_spark.session import get_spark
from pacasam_spark.sources.snapshots import (
    prune_files,
    read_snapshot,
    snapshots,
    write_snapshot,
)
from pacasam_spark.spatial.zorder import cluster_by_zorder

EXTENT = 40_000.0  # metres square


def points(spark, n_rows: int):
    return spark.range(n_rows).select(
        F.col("id").alias("patch_id"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(40_000_000)) / 1000.0).alias("x"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(40_000_000)) / 1000.0).alias("y"),
        F.xxhash64("id", F.lit(3)).alias("payload"),
    )


def prepare(spark, n_rows: int, n_files: int) -> tuple[str, str]:
    ztbl = f"/tmp/prune_bench_{n_rows}_{n_files}_z"
    htbl = f"/tmp/prune_bench_{n_rows}_{n_files}_h"
    if not os.path.isdir(ztbl):
        write_snapshot(
            cluster_by_zorder(points(spark, n_rows), "x", "y", n_files=n_files),
            ztbl,
            {"layout": "zorder"},
            stats_columns=["x", "y"],
        )
    if not os.path.isdir(htbl):
        write_snapshot(
            points(spark, n_rows).repartition(n_files, "patch_id"),
            htbl,
            {"layout": "hash"},
            stats_columns=["x", "y"],
        )
    return ztbl, htbl


def measure(df, pred) -> tuple[float, dict]:
    t0 = time.perf_counter()
    row = (
        df.filter(pred)
        .agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("patch_id", "payload")).alias("chk"),
        )
        .first()
    )
    return time.perf_counter() - t0, {"n": row["n"], "chk": row["chk"]}


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 80_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    selectivity = float(sys.argv[3]) if len(sys.argv) > 3 else 0.005
    spark = get_spark(app_name="prune_bench", cores=16)

    ztbl, htbl = prepare(spark, n_rows, n_files)
    side = EXTENT * math.sqrt(selectivity)
    box = {"x": (17_000.0, 17_000.0 + side), "y": (23_000.0, 23_000.0 + side)}
    pred = F.col("x").between(*box["x"]) & F.col("y").between(*box["y"])
    kept = prune_files(snapshots(ztbl)[-1], box)
    kept_h = prune_files(snapshots(htbl)[-1], box)

    legs = {}
    results = {}
    # interleave trials so a noisy window hits all legs equally
    trials = int(os.environ.get("PRUNE_TRIALS", "3"))
    for name, make in [
        ("A_zorder_pruned", lambda: read_snapshot(spark, ztbl, bounds=box)),
        ("B_zorder_fullscan", lambda: read_snapshot(spark, ztbl)),
        ("C_hash_fullscan", lambda: read_snapshot(spark, htbl)),
    ]:
        legs[name] = []
    for _ in range(trials):
        for name, make in [
            ("A_zorder_pruned", lambda: read_snapshot(spark, ztbl, bounds=box)),
            ("B_zorder_fullscan", lambda: read_snapshot(spark, ztbl)),
            ("C_hash_fullscan", lambda: read_snapshot(spark, htbl)),
        ]:
            sec, res = measure(make(), pred)
            legs[name].append(round(sec, 3))
            results.setdefault(name, res)
            assert results[name] == res, (name, results[name], res)
    first = next(iter(results.values()))
    assert all(r == first for r in results.values()), results
    best = {k: min(v) for k, v in legs.items()}
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "n_files": n_files,
                "box_selectivity": selectivity,
                "rows_matched": first["n"],
                "checksum": first["chk"],
                "files_kept_zorder": len(kept),
                "files_kept_hash_layout": len(kept_h),
                "sec_best": best,
                "sec_all": legs,
                "speedup_prune_vs_hash_scan": round(
                    best["C_hash_fullscan"] / best["A_zorder_pruned"], 2
                ),
                "speedup_prune_vs_zorder_scan": round(
                    best["B_zorder_fullscan"] / best["A_zorder_pruned"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
