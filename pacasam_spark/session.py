"""SparkSession factory tuned for the local test/bench environment while
keeping cluster-scale defaults explicit (AQE, skew join, Arrow).

On a real cluster the same builder applies; only master/memory change.
"""

from __future__ import annotations

import os
import pathlib
import tempfile
import zipfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pacasam_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores: int N -> local[N]; "*" -> local[*]; None -> $SPARK_GRAFT_CPUS or 32.
    shuffle_partitions defaults to the core count — right-sized for local
    mode; on a multi-executor cluster pass ~2-3x total cores instead.
    """
    # Pin BLAS to one thread per Python worker BEFORE the JVM forks:
    # Spark already owns the task-level parallelism, and un-pinned
    # OpenBLAS spawns ncpu threads PER worker — measured 16 workers x 32
    # BLAS threads spending 20x more sys time spin-locking than computing
    # (the FPS kernel ran 4.6x slower per chunk). Local-mode Python
    # workers inherit the driver env; executorEnv covers cluster mode.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = f"local[{cores}]"
    n_cores = os.cpu_count() or 32 if cores == "*" else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = n_cores

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Spark 4.1's arrow.maxBytesPerBatch DEFAULT (Int.MaxValue - 1)
        # enables a per-ROW ArrowWriter.sizeInBytes() walk over every
        # column vector inside mapInPandas/mapInArrow batching
        # (BatchedPythonArrowInput.underBatchSizeLimit only short-circuits
        # on == Int.MaxValue). Measured on a 12-column 80M-row boundary
        # pass: 46 s -> 7 s at local[16] with the sentinel. The byte cap
        # was no protection anyway: maxRecordsPerBatch=10000 binds first
        # for any row under ~200 KB, so rows would have to approach 2 GB
        # per 10k-batch before the byte limit ever triggered.
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(2**31 - 1))
        # Report the SORTED BY order of bucketed scans (off by default
        # since Spark 3.0 because it lists files at planning time; our
        # tables have one file per bucket — see write_bucketed_catalogue
        # — so the listing is trivial and the payoff is large: the
        # per-file rank window over a bucketed catalogue plans with NO
        # Sort at all, the scan streams pre-sorted rows straight into
        # row_number()). The Iceberg equivalent at cluster scale is the
        # table's sort-order metadata.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        # files.maxPartitionBytes default 128m is fine for the test parquet;
        # kept explicit so the scale knob is visible.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Join strategy (optimization guide §3.1/§9, size-based so the
        # same settings hold on a cluster): let the planner pick a
        # shuffled-hash join when a side's per-partition build fits
        # (sort-merge pays two full sorts it doesn't need) and let AQE
        # rewrite SMJ->SHJ at runtime under the same bound. Both are
        # env-overridable for deployments with tighter executor memory.
        # Measured dead end, do not retry: raising
        # autoBroadcastJoinThreshold to 64m made q06 2.1x SLOWER — a
        # 1.5M-row build side costs more to hash-relation-ify per query
        # than the shuffle it saves (broadcast 2.46s vs shuffled-hash
        # 1.14s vs sort-merge 1.20s, interleaved A/B with the harness
        # checksum); Spark's default 10m threshold already broadcasts
        # the genuinely small sides (q03/q33/q41 plan gates).
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", "134217728"),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _quiet_tiny_window_warnings(spark)
    _ship_package(spark)
    return spark


def _quiet_tiny_window_warnings(spark: SparkSession) -> None:
    """Raise the WindowExec logger to ERROR: the engine's unpartitioned
    windows are all over PROVABLY tiny tables (per-file offsets over the
    distinct-file table in fps.py, quota windows over <= targets-sized
    tables in sampling.py/synthetic.py) — plan-gated in
    tools/plan_checks.py and bounded by design, so the per-query
    "Moving all data to a single partition" WARN is pure noise that was
    drowning bench/driver log tails (round-5 verdict #8). Real
    data-sized global windows are forbidden by design review + plan
    checks, not by this log line."""
    try:
        jvm = spark.sparkContext._jvm
        configurator = jvm.org.apache.logging.log4j.core.config.Configurator
        level = jvm.org.apache.logging.log4j.Level.ERROR
        for cls in (
            "org.apache.spark.sql.execution.window.WindowExec",
            "org.apache.spark.sql.execution.window.WindowExecBase",
        ):
            configurator.setLevel(cls, level)
    except Exception:
        pass  # non-log4j2 deployments: keep the warnings


def _ship_package(spark: SparkSession) -> None:
    """Ship pacasam_spark to executor Python workers (the local-mode
    equivalent of ``spark-submit --py-files pacasam_spark.zip``).

    Without this, any applyInPandas/mapInPandas closure referencing the
    package fails on workers whose cwd/sys.path differ from the driver's.
    """
    if getattr(spark, "_pacasam_pyfiles_shipped", False):
        return
    pkg_dir = pathlib.Path(__file__).resolve().parent
    zip_path = pathlib.Path(tempfile.gettempdir()) / "pacasam_spark_pyfiles.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for py in sorted(pkg_dir.rglob("*.py")):
            zf.write(py, arcname=str(py.relative_to(pkg_dir.parent)))
    spark.sparkContext.addPyFile(str(zip_path))
    spark._pacasam_pyfiles_shipped = True
