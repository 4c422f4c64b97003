"""Distributed spherical k-means (Lloyd's) for IVF coarse quantization.

pacasam has no clustering (reference README.md:198 — per-patch rules
only); this is engine surface the ANN/IVF path needs: random seed
centroids (similarity.ivf_centroids) are a one-shot draw, k-means
refines them so IVF cells carry balanced, semantically tight buckets —
the standard FAISS-style coarse quantizer construction.

Scale + determinism design:

- each iteration is bulk-synchronous: ONE broadcast-join assignment pass
  (same shape as similarity.ivf_assign — never a cartesian shuffle) and
  ONE aggregation for the new means. No per-vector state, no driver data
  beyond the k x dim centroid matrix.
- the centroid matrix is collected to the driver between iterations
  (bounded barrier: k*dim doubles, same class as the samplers' quota
  counts) and re-broadcast — this also truncates the logical plan each
  round, avoiding the per-iteration plan-doubling trap the components
  loop documents.
- means use DECIMAL(38,6) sums (operators/normalize.py's exact-sum
  discipline): float addition is partition-order-dependent, decimal is
  exact, so centroids — and every downstream assignment — are identical
  at any parallelism AND in the DuckDB oracle (driver q53).
- assignment is argmax cosine with ties to the smaller centroid id
  (max-struct aggregation, map-side combinable).
- empty clusters keep their previous centroid (mirrored in the oracle).

A fixed ``n_iters`` (rather than a convergence test) keeps the whole fit
expressible as a finite SQL pipeline — the property the oracle gate
needs; IVF refinement in practice uses a handful of Lloyd rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pacasam_spark.operators.similarity import (
    ivf_assign,
    ivf_centroids,
    ivf_centroids_pp,
)


def _recompute_centroids(assigned: DataFrame, vec_col: str) -> DataFrame:
    """(c_id, c_vec): elementwise mean per cell over exact decimal sums;
    cells absent from ``assigned`` simply produce no row (the caller
    coalesces with the previous round's centroids)."""
    dims = assigned.select("cell", F.posexplode(vec_col).alias("d", "v"))
    means = dims.groupBy("cell", "d").agg(
        (
            F.sum(F.col("v").cast("double").cast("decimal(38,6)")).cast("double")
            / F.count("*")
        ).alias("m")
    )
    return (
        means.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("dm"))
        .select(
            F.col("cell").alias("c_id"),
            F.transform("dm", lambda s: s["m"]).alias("c_vec"),
        )
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    n_iters: int = 2,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "uniform",
) -> DataFrame:
    """Centroid table (c_id, c_vec) after ``n_iters`` Lloyd rounds from
    the deterministic seed draw. c_id keeps the seed vector's id — a
    stable cluster label across rounds. ``init='pp'`` seeds with the
    derandomized kmeans++ draw (similarity.ivf_centroids_pp: greedy
    farthest-point over a hash-sampled candidate pool) — measurably
    tighter IVF cells than the uniform draw at the same iteration
    budget (pinned by test_kmeanspp_seeding_tightens_cells)."""
    if init not in ("uniform", "pp"):
        raise ValueError(f"init must be 'uniform' or 'pp', got {init!r}")
    seeder = ivf_centroids_pp if init == "pp" else ivf_centroids
    spark = emb.sparkSession
    cent_rows = [
        (int(r["c_id"]), [float(x) for x in r["c_vec"]])
        for r in seeder(emb, k, seed, id_col=id_col, vec_col=vec_col).collect()
    ]
    for _ in range(n_iters):
        cent = spark.createDataFrame(
            cent_rows, "c_id long, c_vec array<double>"
        )
        assigned = ivf_assign(emb, cent, id_col, vec_col)
        new = {
            int(r["c_id"]): [float(x) for x in r["c_vec"]]
            for r in _recompute_centroids(assigned, vec_col).collect()
        }
        # empty clusters keep the previous centroid
        cent_rows = [(cid, new.get(cid, vec)) for cid, vec in cent_rows]
    return spark.createDataFrame(cent_rows, "c_id long, c_vec array<double>")


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    n_iters: int = 2,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "uniform",
) -> DataFrame:
    """(id, vec, cell) under the fitted centroids — the IVF cell
    assignment with a k-means-refined codebook."""
    cent = kmeans_fit(emb, k, n_iters, seed, id_col, vec_col, init)
    return ivf_assign(emb, cent, id_col, vec_col)
