"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: exact baseline. The query side is small and
  broadcast; dot products are pure column expressions (zip_with +
  aggregate = left fold, bitwise-reproducible and identical to DuckDB's
  list_reduce fold — no UDF, no Python).
- LSH-bucketed variant (scale path): deterministic random-hyperplane
  signs derived from md5 bits of the dimension index; candidates meet in
  bucket equi-joins instead of a full cross product.

At 100 TB the brute-force path is O(Q x N) on the cluster — fine for
small Q (its job is ground truth); the LSH path is the production ANN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Exact left-fold double dot product (matches DuckDB list_reduce)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector.
    queries: (q_id, q_vec) — small, broadcast; emb: the big side."""
    joined = emb.join(F.broadcast(queries)).filter(F.col("q_id") != F.col(id_col))
    cos = _dot(F.col(vec_col), F.col("q_vec")) / (
        _norm(F.col(vec_col)) * _norm(F.col("q_vec"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), id_col)
    return (
        joined.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col(id_col).alias("neighbor_id"), "cos", "rank")
    )


def cosine_pairs_above(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup detection).
    Exact O(N^2) — the oracle-checkable baseline; at scale run it on LSH
    candidates from :func:`hyperplane_lsh_buckets` instead."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    joined = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        joined.withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def _hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """Sign of <vec, h_plane> where h_plane has deterministic ±1 entries:
    entry d = +1 iff the first hex digit of md5('p{plane}d{d}') >= '8'.
    No stored planes, no RNG state — reproducible anywhere."""
    signs = F.array(
        *[
            F.when(
                F.substring(F.md5(F.lit(f"p{plane}d{d}")), 1, 1).isin(
                    "8", "9", "a", "b", "c", "d", "e", "f"
                ),
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
            for d in range(dim)
        ]
    )
    dot = F.aggregate(
        F.zip_with(vec, signs, lambda x, s: x.cast("double") * s),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (dot >= 0).cast("int")


def hyperplane_lsh_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: n_planes sign bits
    packed into an int. Vectors with high cosine collide with high
    probability; ANN = groupBy/join on bucket, then exact re-rank."""
    bucket = None
    for p in range(n_planes):
        bit = _hyperplane_sign(F.col(vec_col), p, dim) * (1 << p)
        bucket = bit if bucket is None else bucket + bit
    return emb.select(id_col, vec_col, bucket.alias("bucket"))


def lsh_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates share the query's LSH bucket; exact cosine
    re-rank within the bucket. Recall < 1 by construction — pair with
    multi-probe (flip one bit) for production recall."""
    data_b = hyperplane_lsh_buckets(emb, n_planes, dim, id_col, vec_col)
    q_b = hyperplane_lsh_buckets(
        queries.withColumnRenamed("q_vec", vec_col).withColumnRenamed("q_id", id_col),
        n_planes,
        dim,
        id_col,
        vec_col,
    ).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), "bucket"
    )
    joined = data_b.join(F.broadcast(q_b), on="bucket").filter(
        F.col("q_id") != F.col(id_col)
    )
    cos = _dot(F.col(vec_col), F.col("q_vec")) / (
        _norm(F.col(vec_col)) * _norm(F.col("q_vec"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), id_col)
    return (
        joined.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col(id_col).alias("neighbor_id"), "cos", "rank")
    )
