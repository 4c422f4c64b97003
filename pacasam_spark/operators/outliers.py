"""Outlier scoring (SURVEY.md §2.11 M5 — documented approximation).

The reference scores outliers with HDBSCAN's GLOSH
(reference: samplers/outliers.py:42-47; config Lipac.yml:55-58). HDBSCAN is
unavailable here and has no distributed builtin, so the engine provides a
pluggable scorer whose default is a chunk-local kNN-density score computed
in vectorized numpy via ``applyInPandas``:

    score(x) = rank-normalized mean distance to the k nearest neighbours
               within the chunk; cluster_id = nearest seed under a
               deterministic k-medoid-style assignment.

This satisfies the reference's test contract (schema, non-emptiness, top-k
ordering semantics — tests/tests_pacasam/test_run_sampling.py:37-41) and is
the one knowingly-approximate operator in the engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pacasam_spark import schemas as S
from pacasam_spark.operators.fps import CHUNK_ID, add_deterministic_chunk_ids, fps_numpy

OUTLIER_SCORE = "outlier_score"
CLUSTER_ID = "cluster_id"


def knn_outlier_scores(
    df: DataFrame,
    feature_cols: list[str],
    k: int = 50,
    n_clusters: int = 8,
    max_chunk_size: int = 5000,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Adds (cluster_id, outlier_score in [0,1]) per row, chunk-locally."""
    keep = keep_cols or [S.PATCH_ID, S.FILE_ID]
    chunked = add_deterministic_chunk_ids(df, max_chunk_size)
    cols = list(dict.fromkeys(keep + feature_cols + [CHUNK_ID]))
    chunked = chunked.select(*cols)

    field_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(
        [f"{c} {field_types[c]}" for c in keep]
        + [f"{CLUSTER_ID} int", f"{OUTLIER_SCORE} double"]
    )

    def score_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(keep[0]).reset_index(drop=True)
        x = pdf[feature_cols].to_numpy(dtype=float)
        n = len(x)
        kk = min(k, n - 1) if n > 1 else 1
        # pairwise distances chunk-locally (chunk <= max_chunk_size)
        d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        knn_mean = np.sort(d2, axis=1)[:, :kk].mean(axis=1) if n > 1 else np.zeros(n)
        order = knn_mean.argsort().argsort()  # rank-normalize
        score = order / max(n - 1, 1)
        # deterministic seeds via FPS (well-spread medoids), assign nearest
        seeds = fps_numpy(x, min(n_clusters, n))
        assign = d2[:, seeds].argmin(axis=1) if len(seeds) else np.zeros(n, int)
        assign[seeds] = np.arange(len(seeds))
        out = pdf[keep].copy()
        out[CLUSTER_ID] = assign.astype("int32")
        out[OUTLIER_SCORE] = score
        return out

    return chunked.groupBy(CHUNK_ID).applyInPandas(score_chunk, schema=out_schema)
