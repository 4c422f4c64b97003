"""HDBSCAN*+GLOSH kernel (operators/hdbscan_np.py) — the real M5 path
(reference: samplers/outliers.py:58-61 runs hdbscan.HDBSCAN(...).fit
with eom selection and takes outlier_scores_). Validated structurally:
MST weight against brute-force mutual-reachability Prim, blob/outlier
recovery, permutation invariance, and two-core-count determinism of
the distributed operator."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pacasam_spark.operators.hdbscan_np import (
    core_distances,
    hdbscan_chunk,
    mst_edges,
)

RNG = np.random.default_rng(3)


def _brute_mst_weight(x, ms):
    n = len(x)
    core = core_distances(x, ms)
    d = np.sqrt(np.maximum(((x[:, None, :] - x[None, :, :]) ** 2).sum(-1), 0))
    mr = np.maximum(np.maximum(d, core[:, None]), core[None, :])
    seen = {0}
    w = 0.0
    best = mr[0].copy()
    for _ in range(n - 1):
        best[list(seen)] = np.inf
        j = int(best.argmin())
        w += best[j]
        seen.add(j)
        best = np.minimum(best, mr[j])
    return w


def test_mst_matches_brute_force():
    for _ in range(5):
        y = RNG.normal(size=(60, 3))
        e = mst_edges(y, core_distances(y, 4))
        assert abs(e[:, 2].sum() - _brute_mst_weight(y, 4)) < 1e-8


def _blobs_and_outliers():
    a = RNG.normal(0, 0.3, (200, 2))
    b = RNG.normal(5, 0.3, (150, 2)) + [0, 5]
    o = np.array([[20.0, -20.0], [-15.0, 30.0]])
    return np.vstack([a, b, o])


def test_blob_recovery_and_glosh_ranking():
    x = _blobs_and_outliers()
    labels, score = hdbscan_chunk(x, min_samples=5, min_cluster_size=25)
    # the two planted blobs come out as exactly two clusters
    assert set(labels[:200]) == {0}
    assert set(labels[200:350]) == {1}
    # planted far outliers are noise with the top scores
    assert set(labels[350:]) == {-1}
    assert set(np.argsort(-score)[:2]) == {350, 351}
    assert score.min() >= 0.0 and score.max() <= 1.0
    # dense cores score low
    assert np.median(score[:350]) < 0.5


def test_permutation_invariance():
    x = _blobs_and_outliers()
    labels, score = hdbscan_chunk(x, 5, 25)
    perm = RNG.permutation(len(x))
    l2, s2 = hdbscan_chunk(x[perm], 5, 25)
    assert np.allclose(np.sort(s2), np.sort(score))
    inv = np.empty(len(x), int)
    inv[perm] = np.arange(len(x))
    pairs = RNG.integers(0, len(x), (400, 2))
    same1 = labels[pairs[:, 0]] == labels[pairs[:, 1]]
    noise1 = labels[pairs[:, 0]] < 0
    same2 = l2[inv[pairs[:, 0]]] == l2[inv[pairs[:, 1]]]
    noise2 = l2[inv[pairs[:, 0]]] < 0
    assert np.array_equal(same1 & ~noise1, same2 & ~noise2)
    assert np.array_equal(noise1, noise2)


def test_degenerate_inputs():
    # duplicates, tiny n, all-identical
    z = np.zeros((40, 2))
    z[20:] = 1.0
    labels, score = hdbscan_chunk(z, 3, 5)
    assert len(set(labels)) >= 1 and np.all(score == 0.0)
    l1, s1 = hdbscan_chunk(np.zeros((1, 3)), 3, 5)
    assert list(l1) == [-1] and list(s1) == [0.0]


def test_glosh_operator_distributed(spark):
    """The DataFrame operator chunks deterministically: same scores at
    any parallelism, schema (keep + cluster_id + outlier_score)."""
    from pacasam_spark.operators.normalize import standardize
    from pacasam_spark.operators.outliers import glosh_outlier_scores
    from pacasam_spark.sources.synthetic import synthetic_catalogue

    cols = ["nb_sol", "nb_bati", "nb_eau"]
    db = standardize(
        synthetic_catalogue(spark, db_size=1500).select(
            "patch_id", "file_id", *cols
        ),
        cols,
    )
    scored = glosh_outlier_scores(
        db, cols, min_samples=20, min_cluster_size=30, max_chunk_size=400
    )
    rows = scored.collect()
    assert len(rows) == 1500
    assert {r["patch_id"] for r in rows} == set(range(1500))
    assert all(0.0 <= r["outlier_score"] <= 1.0 for r in rows)
    # repartitioned input -> identical scores (chunk ids are rank-derived)
    scored2 = glosh_outlier_scores(
        db.repartition(17), cols,
        min_samples=20, min_cluster_size=30, max_chunk_size=400,
    )
    a = sorted((r["patch_id"], r["cluster_id"], r["outlier_score"]) for r in rows)
    b = sorted(
        (r["patch_id"], r["cluster_id"], r["outlier_score"])
        for r in scored2.collect()
    )
    assert a == b


def test_outliers_sampler_glosh_path(spark):
    """hdbscan_kwargs in the config (the reference Lipac.yml shape)
    routes the sampler through the GLOSH kernel; contract unchanged."""
    from pacasam_spark.samplers import OutliersSampler
    from pacasam_spark.sources.synthetic import synthetic_catalogue

    db = synthetic_catalogue(spark, db_size=1000)
    cfg = {
        "target_total_num_patches": 60,
        "frac_validation_set": 0.1,
        "OutliersSampler": {
            "columns": ["nb_sol", "nb_bati", "nb_eau"],
            "max_chunk_size": 500,
            "hdbscan_kwargs": {
                "min_cluster_size": 50,
                "min_samples": 50,
                "cluster_selection_method": "eom",
            },
        },
    }
    rows = OutliersSampler(db, cfg).get_patches().collect()
    assert len(rows) == 60
    assert sum(1 for r in rows if r["split"] == "val") == 6
    assert {r["sampler"] for r in rows} == {"OutliersSampler"}
    with pytest.raises(ValueError, match="eom"):
        cfg["OutliersSampler"]["hdbscan_kwargs"]["cluster_selection_method"] = "leaf"
        OutliersSampler(db, cfg).get_patches()
