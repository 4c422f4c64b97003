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


def _pairs_emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    ).select("vec_id", "embedding")


def test_lsh_pairs_subset_of_exact_with_high_recall(spark):
    """LSH near-dup pairs at the q46-gated params (r=5, L=24):
    precision 1 (subset of the exact O(N^2) result, same cos values) and
    recall >= 0.8 on near-random vectors (the hardest case)."""
    from pacasam_spark.operators.similarity import (
        cosine_pairs_above,
        lsh_cosine_pairs_above,
    )

    emb = _pairs_emb(spark)
    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in cosine_pairs_above(emb, 0.25).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in lsh_cosine_pairs_above(emb, 0.25, n_planes=5, n_tables=24).collect()
    }
    assert set(lsh) <= set(exact)  # precision 1
    for k, v in lsh.items():
        assert exact[k] == v  # exact re-scoring
    recall = len(lsh) / len(exact)
    assert recall >= 0.8, recall


def test_lsh_pairs_candidates_below_exact_join(spark):
    """The whole point of the LSH pairs path: at the q46-gated params the
    DISTINCT candidate set must be strictly smaller than the N(N-1)/2
    pairs the exact join scores (r too small degenerates to >= brute
    force — the round-2 verdict's scale-killer)."""
    from pacasam_spark.operators.similarity import lsh_table_buckets

    emb = _pairs_emb(spark)
    n = emb.count()
    tb = lsh_table_buckets(emb, 5, 24, 64, ["vec_id"], "embedding")
    a = tb.select(F.col("vec_id").alias("id_a"), "tbl", "bucket")
    b = tb.select(F.col("vec_id").alias("id_b"), "tbl", "bucket")
    n_cand = (
        a.join(b, on=["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    exact_cand = n * (n - 1) // 2
    assert n_cand < 0.7 * exact_cand, (n_cand, exact_cand)


def test_lsh_pairs_bucket_guard_surfaces_truncation(spark):
    """max_bucket_size drops over-full buckets BEFORE the self-join and
    reports them: pairs(guarded) is a subset of pairs(unguarded) and the
    dropped table names the guarded buckets (never silent)."""
    from pacasam_spark.operators.similarity import lsh_cosine_pairs_above

    emb = _pairs_emb(spark)
    full = {
        (r["id_a"], r["id_b"])
        for r in lsh_cosine_pairs_above(emb, 0.25, n_planes=3, n_tables=4).collect()
    }
    guarded, dropped = lsh_cosine_pairs_above(
        emb, 0.25, n_planes=3, n_tables=4, max_bucket_size=20, return_dropped=True
    )
    got = {(r["id_a"], r["id_b"]) for r in guarded.collect()}
    n_dropped = dropped.count()
    # 200 vectors over 8 buckets/table -> every bucket is over the cap of 20
    assert n_dropped > 0
    assert got <= full
    assert len(got) < len(full)
    assert dropped.agg(F.min("count")).first()[0] > 20
    # no-op cap reports nothing and changes nothing
    same, none_dropped = lsh_cosine_pairs_above(
        emb, 0.25, n_planes=3, n_tables=4, max_bucket_size=10**6, return_dropped=True
    )
    assert none_dropped.count() == 0
    assert {(r["id_a"], r["id_b"]) for r in same.collect()} == full


def test_lsh_pairs_auto_planes_scale_with_corpus(spark):
    """n_planes='auto' derives r from N/target_bucket_size, so expected
    bucket occupancy stays ~constant as the corpus grows."""
    from pacasam_spark.operators.similarity import lsh_cosine_pairs_above

    emb = _pairs_emb(spark)
    # N=200, target 16 -> r = ceil(log2(12.5)) = 4; target 64 -> r = 2
    p4 = lsh_cosine_pairs_above(
        emb, 0.25, n_planes="auto", n_tables=4, target_bucket_size=16
    )
    p2 = lsh_cosine_pairs_above(
        emb, 0.25, n_planes="auto", n_tables=4, target_bucket_size=64
    )
    # both run and stay precision-1; the coarser hash can only find MORE
    # pairs (more collisions)
    n4, n2 = p4.count(), p2.count()
    assert n2 >= n4 > 0


def test_lsh_bucket_fold_is_long_beyond_31_planes(spark):
    """The bucket id is a signed-LONG bit fold: auto-derived plane
    counts grow with corpus size, and an int fold overflows (ANSI mode
    raises) at n_planes >= 32. 40 planes must produce distinct long
    buckets without error."""
    from pacasam_spark.operators.similarity import lsh_table_buckets

    df = spark.createDataFrame(
        [(i, [float((i * 7 + j * 13) % 19 - 9) for j in range(8)]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    out = lsh_table_buckets(df, n_planes=40, n_tables=1, dim=8,
                            keep_cols=["vec_id"], vec_col="embedding")
    rows = out.collect()
    assert out.schema["bucket"].dataType.simpleString() == "bigint"
    assert len(rows) == 6
    assert all(0 <= r["bucket"] < (1 << 40) for r in rows)


def test_lsh_pairs_corpus_count_and_plane_cap(spark):
    """corpus_count skips the internal count job and n_planes='auto' is
    capped at 62 (the long-fold bound) even for absurd corpus sizes."""
    from pacasam_spark.operators.similarity import lsh_cosine_pairs_above

    df = spark.createDataFrame(
        [(i, [float((i * 7 + j * 13) % 19 - 9) for j in range(8)]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    out = lsh_cosine_pairs_above(
        df, threshold=0.99, n_planes="auto", n_tables=1, dim=8,
        corpus_count=10**13, target_bucket_size=1,
    )
    # derived r = min(62, ceil(log2(1e13))) = 44 -> runs, returns pairs
    assert out.count() >= 0


def test_kmeans_deterministic_across_partitionings(spark):
    """Exact decimal means + argmax-with-tiebreak => identical cells at
    any input partitioning."""
    from pacasam_spark.operators.kmeans import kmeans_assign

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = sorted(
        (r["vec_id"], r["cell"])
        for r in kmeans_assign(emb.repartition(1), k=6, n_iters=2).collect()
    )
    b = sorted(
        (r["vec_id"], r["cell"])
        for r in kmeans_assign(emb.repartition(13), k=6, n_iters=2).collect()
    )
    assert a == b and len(a) == emb.count()


def test_kmeans_refinement_improves_objective(spark):
    """Lloyd rounds cannot worsen the spherical k-means objective: mean
    max-cosine-to-centroid after 3 rounds >= after 0 rounds."""
    from pyspark.sql import functions as F

    from pacasam_spark.operators.kmeans import kmeans_fit
    from pacasam_spark.operators.similarity import (
        _dot,
        _norm,
        ivf_assign,
        ivf_centroids,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def objective(cent):
        cos = _dot(F.col("embedding"), F.col("c_vec")) / (
            _norm(F.col("embedding")) * _norm(F.col("c_vec"))
        )
        j = emb.join(F.broadcast(cent)).withColumn("__cos", cos)
        best = j.groupBy("vec_id").agg(F.max("__cos").alias("m"))
        return best.agg(F.avg("m")).first()[0]

    seed_obj = objective(
        ivf_centroids(emb, 6, 7).select(
            "c_id", F.col("c_vec").cast("array<double>").alias("c_vec")
        )
    )
    fit_obj = objective(kmeans_fit(emb, k=6, n_iters=3, seed=7))
    assert fit_obj >= seed_obj - 1e-12
    # refined assignment still covers every vector with seed-id labels
    cells = ivf_assign(emb, kmeans_fit(emb, k=6, n_iters=3, seed=7))
    assert cells.count() == emb.count()


def test_kmeans_empty_cluster_keeps_seed_centroid(spark):
    """k seeds over fewer distinct vectors: clusters that win nothing
    keep their previous centroid instead of vanishing."""
    from pacasam_spark.operators.kmeans import kmeans_fit

    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(5)]
    rows += [(10 + i, [0.0, 1.0, 0.0, 0.0]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cent = kmeans_fit(emb, k=4, n_iters=2, seed=7)
    got = {r["c_id"]: r["c_vec"] for r in cent.collect()}
    assert len(got) == 4  # all four clusters survive
    for vec in got.values():
        assert len(vec) == 4


def test_ivf_refined_exhaustive_probe_still_equals_brute_force(spark):
    """The exhaustive-probe == brute-force identity is codebook-
    independent — it must hold under k-means-refined centroids too."""
    from pacasam_spark.operators.similarity import cosine_topk, ivf_cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter("vec_id < 10").selectExpr(
        "vec_id as q_id", "embedding as q_vec"
    )
    brute = sorted(
        (r["q_id"], r["rank"], r["neighbor_id"])
        for r in cosine_topk(emb, q, k=3).collect()
    )
    refined = sorted(
        (r["q_id"], r["rank"], r["neighbor_id"])
        for r in ivf_cosine_topk(
            emb, q, k=3, n_centroids=6, nprobe=6, refine_iters=2
        ).collect()
    )
    assert refined == brute


def test_kmeanspp_seeding_tightens_cells(spark):
    """init='pp' (greedy farthest-point over the hash-sampled candidate
    pool) yields a strictly better spherical k-means objective — lower
    mean intra-cell cosine distance — than the uniform draw at q53's
    exact config, and stays deterministic across partitionings."""
    from pyspark.sql import functions as F

    from pacasam_spark.operators.kmeans import kmeans_assign, kmeans_fit
    from pacasam_spark.operators.similarity import _dot, _norm

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

    def objective(cent):
        cos = _dot(F.col("embedding"), F.col("c_vec")) / (
            _norm(F.col("embedding")) * _norm(F.col("c_vec"))
        )
        j = emb.join(F.broadcast(cent)).withColumn("__cos", cos)
        return j.groupBy("vec_id").agg(F.max("__cos").alias("m")).agg(
            F.avg("m")
        ).first()[0]

    uni = objective(kmeans_fit(emb, k=8, n_iters=2, seed=7, init="uniform"))
    pp = objective(kmeans_fit(emb, k=8, n_iters=2, seed=7, init="pp"))
    assert pp > uni  # measured 0.2599 vs 0.2540 on this fixture

    a = sorted(
        (r["vec_id"], r["cell"])
        for r in kmeans_assign(
            emb.repartition(1), k=8, n_iters=2, init="pp"
        ).collect()
    )
    b = sorted(
        (r["vec_id"], r["cell"])
        for r in kmeans_assign(
            emb.repartition(13), k=8, n_iters=2, init="pp"
        ).collect()
    )
    assert a == b and len(a) == emb.count()
