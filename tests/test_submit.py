"""North-rule ship shape: the sampling CLI runs under a REAL
``spark-submit --py-files pacasam_spark.zip`` from a cwd outside the
repo — the exact way a multi-executor cluster receives the package
(reference workflow: run_sampling.py as the submitted application).

In-process tests exercise `main()` with the package importable from
source; this one proves the zip alone is enough for BOTH the driver
script's imports and the Python UDF workers.
"""

import json
import os
import pathlib
import subprocess
import zipfile

import duckdb
import pyspark


def _build_pyfiles_zip(dest: pathlib.Path) -> str:
    pkg_dir = pathlib.Path(__file__).resolve().parents[1] / "pacasam_spark"
    zip_path = dest / "pacasam_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for py in sorted(pkg_dir.rglob("*.py")):
            zf.write(py, arcname=str(py.relative_to(pkg_dir.parent)))
    return str(zip_path)


def test_spark_submit_py_files_sampling(tmp_path):
    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    script = str(
        pathlib.Path(__file__).resolve().parents[1]
        / "pacasam_spark" / "run_sampling.py"
    )
    out_dir = str(tmp_path / "out")
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    # cwd OUTSIDE the repo: nothing importable except through --py-files
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", _build_pyfiles_zip(tmp_path),
            script,
            "--sampler_class", "TargettedSampler",
            "--db-size", "2000",
            "--target", "100",
            "--split", "train",
            "--output", out_dir,
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summaries = [
        json.loads(line)
        for line in proc.stdout.splitlines()
        if line.startswith("{")
    ]
    assert summaries and summaries[-1]["n_sampled"] == 100

    path = f"{out_dir}/SyntheticConnector-TargettedSampler-train/*.parquet"
    n, n_ids = duckdb.sql(
        f"select count(*), count(distinct patch_id) from read_parquet('{path}')"
    ).fetchone()
    assert n == 100 and n_ids == 100
