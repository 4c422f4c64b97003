"""Model-based property test of the snapshot table format: a random
sequence of overwrite/append/upsert commits must behave exactly like a
trivial in-memory model — for the LATEST read, for TIME TRAVEL to every
intermediate version, for total_row_count accounting, for bounds-pruned
reads, and after refcounted expiry. This is the test that catches
interaction bugs between chain resolution, logical file removal and
stats pruning that single-scenario tests miss."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pacasam_spark.sources.snapshots import (
    expire_snapshots,
    read_snapshot,
    snapshots,
    write_snapshot,
    upsert_snapshot,
)

KEYS = st.integers(min_value=0, max_value=29)


def rows_strategy():
    # unique keys per op: upsert with an intra-batch duplicate key has no
    # single-model semantics (both rows land); the engine is tested on
    # the well-defined surface
    return st.dictionaries(KEYS, st.sampled_from("abcd"), min_size=1, max_size=8)


ops_strategy = st.lists(
    st.tuples(st.sampled_from(["overwrite", "append", "upsert"]), rows_strategy()),
    min_size=2,
    max_size=6,
)


def _df(spark, rows: dict[int, str]):
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(rows.items())], "patch_id long, v string"
    ).repartition(2)


def _table(spark, d):
    return sorted(
        (r["patch_id"], r["v"]) for r in read_snapshot(spark, d).collect()
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops_strategy)
def test_commit_sequence_matches_model(spark, tmp_path_factory, ops):
    d = str(tmp_path_factory.mktemp("model") / "tbl")
    model: list[tuple[int, str]] = []  # multiset of (key, value) rows
    states: dict[int, list[tuple[int, str]]] = {}

    for op, rows in ops:
        batch = sorted(rows.items())
        if op == "overwrite":
            v = write_snapshot(_df(spark, rows), d, stats_columns=["patch_id"])
            model = batch
        elif op == "append":
            v = write_snapshot(
                _df(spark, rows), d, mode="append", stats_columns=["patch_id"]
            )
            model = model + batch  # append NEVER dedupes
        else:
            v = upsert_snapshot(
                spark, d, _df(spark, rows), "patch_id",
                stats_columns=["patch_id"],
            )
            model = [r for r in model if r[0] not in rows] + batch
        model = sorted(model)
        states[v] = model
        assert snapshots(d)[-1]["total_row_count"] == len(model)

    # latest read == model
    assert _table(spark, d) == model
    # time travel: every version reads its recorded state
    for v, state in states.items():
        got = sorted(
            (r["patch_id"], r["v"])
            for r in read_snapshot(spark, d, version=v).collect()
        )
        assert got == state, f"v{v}"
    # bounds-pruned read == model filter (pruning must stay exact across
    # append/upsert chains)
    bounds = {"patch_id": (5, 14)}
    got = sorted(
        (r["patch_id"], r["v"])
        for r in read_snapshot(spark, d, bounds=bounds)
        .filter(F.col("patch_id").between(5, 14))
        .collect()
    )
    assert got == [r for r in model if 5 <= r[0] <= 14]
    # refcounted expiry never breaks the latest version
    expire_snapshots(d, keep_last=1)
    assert _table(spark, d) == model
