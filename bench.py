"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the north-metric
sampling pipeline (TripleSampler over a synthetic catalogue).

Noise robustness (round-7 verdict #2): this box's CPU frequency scaling
swings identical-config wall times by 1.3-1.9x, so a single-shot bench
measures weather, not code. Every headline query and both sampler legs
run $BENCH_TRIALS times (default 3) INTERLEAVED — all queries in round 1,
then all in round 2, ... — so a slow window hits every query equally
instead of poisoning whichever ran inside it; the reported number is the
per-query minimum and the full trial lists ship in the artifact under
"trials". Between sampler trials the CacheManager is cleared: the
pipeline persists intermediates (normalize stats, targetted selection)
and Spark donates cached results to canonical-equal plans, which would
make trial 2 a fake cache read.

Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: best sec, ...}, "trials": {name: [sec, ...], ...},
 "sf": ..., "throughput": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_query(df) -> int:
    """Force FULL-WIDTH execution without driver collect cost.

    A bare count() lets Catalyst prune unreferenced projection work for
    pure-projection queries (q02/q13/q17 shapes), so the bench would not
    measure the advertised expressions. A checksum over xxhash64 of every
    output column keeps all of them alive; the decimal cast dodges ANSI
    long-overflow on the sum.
    """
    from pyspark.sql import functions as F

    row = df.agg(
        F.sum(
            F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
        ).alias("chk"),
        F.count("*").alias("n"),
    ).first()
    return int(row["n"])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    db_size = int(os.environ.get("BENCH_CATALOGUE_SIZE", "400000"))
    target = int(os.environ.get("BENCH_SAMPLING_TARGET", "20000"))

    import __spark_entry__ as E
    from pacasam_spark.samplers import TripleSampler
    from pacasam_spark.session import get_spark
    from pacasam_spark.sources.synthetic import synthetic_catalogue

    spark = get_spark(app_name="pacasam_spark_bench", cores=cpus)

    headline = [
        "q01_pricing_summary",
        "q03_extraction_join",
        "q06_asof_nearest",
        "q08_bool_rollup",
        "q10_random_sample",
        "q11_stratified_sample",
        "q12_union_dedup_priority",
        "q14_cell_index",
        "q16_standardize",
        "q17_percent_rank",
        # round 3 additions: image-payload dedup + graph clustering +
        # native session windows (BENCH.md notes the headline-set change)
        "q48_phash_near_dup",
        "q49_dedup_components",
        "q50_session_window",
    ]
    queries = E.queries()
    n_trials = int(os.environ.get("BENCH_TRIALS", "3"))
    trials: dict[str, list[float]] = {name: [] for name in headline}
    # Warm the session ONCE before timing anything: the first parquet
    # read pays JVM classloading + codegen + file-listing costs that
    # belong to session startup, not to whichever query happens to run
    # first (q01 was absorbing ~3-4 s of it). The warm-up plan shares no
    # operator shape with the headline queries and caches nothing.
    from pyspark.sql import functions as F

    for t in ("lineitem", "orders", "events", "documents"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").select(
            F.count("*")
        ).first()
    for _ in range(n_trials):
        for name in headline:
            t0 = time.perf_counter()
            run_query(queries[name](spark, sf_dir))
            trials[name].append(round(time.perf_counter() - t0, 3))
        # release round-local JVM litter (q49's localCheckpoint blocks,
        # shuffle files) so later rounds aren't taxed for earlier ones
        spark.sparkContext._jvm.System.gc()
    timings = {name: min(ts) for name, ts in trials.items()}

    # North metric: full TripleSampler pipeline over a synthetic catalogue
    # (threshold descriptor assignment at bench scale — the scale path).
    cfg = {
        "target_total_num_patches": target,
        "frac_validation_set": 0.1,
        "TargettedSampler": {
            "targets": {
                "C0": {"target_min_samples_proportion": 0.20},
                "C1": {"target_min_samples_proportion": 0.05},
                "C2": {"target_min_samples_proportion": 0.05},
                "C3": {"target_min_samples_proportion": 0.2},
            }
        },
        "DiversitySampler": {
            "max_chunk_size_for_fps": 20000,
            "normalization": "standardization",
            "columns": [
                "nb_sol", "nb_bati", "nb_vegetation_basse",
                "nb_vegetation_moyenne", "nb_vegetation_haute",
                "nb_pont", "nb_eau", "nb_sursol_perenne", "nb_non_classes",
            ],
        },
    }
    db = synthetic_catalogue(spark, db_size=db_size, exact_counts=False)

    # Both layouts — flat in-memory catalogue vs the COMBINED snapshot
    # layout (round 7: write_snapshot(bucket_by=..., norm_columns=...,
    # count_key=...) — Iceberg bucket(n, file_id) transform + manifest-
    # carried stats): the combined leg plans ZERO file_id exchanges
    # (bucketed scan) AND zero stats scans (manifest-fed), so each
    # sampling run reads the data once and shuffles once. Run n_trials
    # times A/B interleaved within each round so the layout comparison
    # shares each round's frequency weather. The one-time snapshot
    # commit is ingest cost and stays untimed.
    import copy
    import shutil
    import tempfile

    from pacasam_spark.sources.snapshots import read_snapshot, write_snapshot

    trials["triple_sampler_pipeline"] = []
    trials["triple_sampler_snapshot"] = []
    n_sampled = 0
    bdir = tempfile.mkdtemp(prefix="bench_snapshot_")
    tbl = f"{bdir}/catalogue"
    try:
        write_snapshot(
            db,
            tbl,
            norm_columns=cfg["DiversitySampler"]["columns"],
            count_key="file_id",
            bucket_by=("file_id", 32),
            sort_by=("file_id", "patch_id"),
        )
        snap = read_snapshot(spark, tbl)
        cfg_snap = copy.deepcopy(cfg)
        cfg_snap["DiversitySampler"]["manifest_stats"] = {"dir": tbl}
        for _ in range(n_trials):
            # clearCache between trials: the pipeline persists
            # intermediates and identical plans would donate them to the
            # next trial. The db cache itself is rebuilt untimed.
            spark.catalog.clearCache()
            db.cache().count()  # materialize outside the timed section
            t0 = time.perf_counter()
            n_sampled = TripleSampler(db, cfg).get_patches().count()
            trials["triple_sampler_pipeline"].append(
                round(time.perf_counter() - t0, 3)
            )
            db.unpersist()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n_b = TripleSampler(snap, cfg_snap).get_patches().count()
            trials["triple_sampler_snapshot"].append(
                round(time.perf_counter() - t0, 3)
            )
            assert n_b == n_sampled, (n_b, n_sampled)
            spark.sparkContext._jvm.System.gc()
    finally:
        # DROP must run even when the snapshot leg throws: the temp data
        # dir is removed below, and a stale catalog entry pointing at a
        # deleted location breaks the next run in the same warehouse.
        for t in spark.catalog.listTables():
            if t.name.startswith("snap_bucketed_"):
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")
        shutil.rmtree(bdir, ignore_errors=True)

    dt = min(trials["triple_sampler_pipeline"])
    dt_b = min(trials["triple_sampler_snapshot"])
    timings["triple_sampler_pipeline"] = dt
    timings["triple_sampler_snapshot"] = dt_b
    patches_per_sec = n_sampled / dt if dt > 0 else 0.0
    snapshot_speedup = dt / dt_b if dt_b > 0 else 0.0

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total headline query + sampling pipeline wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "trials": trials,
                "n_trials": n_trials,
                "sf": sf_dir.rstrip("/").split("sf")[-1],
                "throughput": {
                    "sampled_patches_per_sec": round(patches_per_sec, 1),
                    "sampled_patches_per_sec_snapshot": round(
                        n_sampled / dt_b if dt_b > 0 else 0.0, 1
                    ),
                    "catalogue_size": db_size,
                    "sampling_target": target,
                    "n_sampled": n_sampled,
                    "cpus": cpus,
                    "snapshot_layout_speedup": round(snapshot_speedup, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
