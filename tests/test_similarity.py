"""ANN / similarity-search tests (SURVEY.md training-data ops).

The driver's q28 (brute force) and q41 (LSH) gate value-correctness
against DuckDB; these tests gate the RECALL of the ANN path — the
property SQL can't express.
"""

import pytest
from pyspark.sql import functions as F

from pacasam_spark.operators.similarity import cosine_topk, lsh_cosine_topk

SF_DIR = "/root/testdata/sf0.001"
K = 5


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


def _pairs(df):
    return {(r["q_id"], r["neighbor_id"]) for r in df.collect()}


def test_lsh_multiprobe_recall_vs_brute_force(emb, queries):
    """Deterministic recall of the multi-table multi-probe ANN vs exact
    top-k. The synthetic embeddings are near-random (per-plane
    disagreement ~0.4 for true neighbours) — the WORST case for
    hyperplane LSH — so >= 0.9 here is a conservative floor for clustered
    production embeddings."""
    truth = _pairs(cosine_topk(emb, queries, k=K))
    ann = _pairs(lsh_cosine_topk(emb, queries, k=K, n_planes=6, n_tables=10))
    recall = len(truth & ann) / len(truth)
    assert recall >= 0.9, recall


def test_lsh_single_probe_recall_lower(emb, queries):
    """Multi-probe must buy recall over single-probe (sanity that the
    probing actually widens the candidate set)."""
    truth = _pairs(cosine_topk(emb, queries, k=K))
    multi = _pairs(
        lsh_cosine_topk(emb, queries, k=K, n_planes=6, n_tables=4, multi_probe=True)
    )
    single = _pairs(
        lsh_cosine_topk(emb, queries, k=K, n_planes=6, n_tables=4, multi_probe=False)
    )
    r_multi = len(truth & multi) / len(truth)
    r_single = len(truth & single) / len(truth)
    assert r_multi > r_single


def test_lsh_topk_values_are_exact_cosines(emb, queries):
    """Whatever candidates LSH surfaces, their cos values must equal the
    brute-force cosines (the re-rank is exact)."""
    truth = {
        (r["q_id"], r["neighbor_id"]): r["cos"]
        for r in cosine_topk(emb, queries, k=50).collect()
    }
    for r in lsh_cosine_topk(emb, queries, k=3, n_planes=6, n_tables=6).collect():
        key = (r["q_id"], r["neighbor_id"])
        if key in truth:  # rank-50 cutoff on the truth side
            assert truth[key] == r["cos"]


def test_ivf_exhaustive_probe_equals_brute_force(emb, queries):
    """With nprobe = n_centroids every cell is probed, so IVF must return
    EXACTLY the brute-force top-k (ids, cos, ranks)."""
    from pacasam_spark.operators.similarity import ivf_cosine_topk

    brute = {
        (r["q_id"], r["rank"]): (r["neighbor_id"], r["cos"])
        for r in cosine_topk(emb, queries, k=K).collect()
    }
    ivf = {
        (r["q_id"], r["rank"]): (r["neighbor_id"], r["cos"])
        for r in ivf_cosine_topk(
            emb, queries, k=K, n_centroids=8, nprobe=8
        ).collect()
    }
    assert ivf == brute


def test_ivf_recall_monotone_in_nprobe(emb, queries):
    from pacasam_spark.operators.similarity import ivf_cosine_topk

    truth = _pairs(cosine_topk(emb, queries, k=K))
    recalls = []
    for nprobe in (1, 4, 16):
        got = _pairs(ivf_cosine_topk(emb, queries, k=K, n_centroids=16, nprobe=nprobe))
        recalls.append(len(truth & got) / len(truth))
    assert recalls[0] <= recalls[1] <= recalls[2] == 1.0
    assert recalls[1] > 0  # probing 1/4 of cells finds a useful share


def test_lsh_pairs_subset_of_exact_with_high_recall(spark):
    """LSH near-dup pairs: precision 1 (subset of the exact O(N^2)
    result, same cos values) and recall >= 0.8 on near-random vectors."""
    from pacasam_spark.operators.similarity import (
        cosine_pairs_above,
        lsh_cosine_pairs_above,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    ).select("vec_id", "embedding")
    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in cosine_pairs_above(emb, 0.25).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in lsh_cosine_pairs_above(emb, 0.25, n_planes=3, n_tables=12).collect()
    }
    assert set(lsh) <= set(exact)  # precision 1
    for k, v in lsh.items():
        assert exact[k] == v  # exact re-scoring
    recall = len(lsh) / len(exact)
    assert recall >= 0.8, recall
