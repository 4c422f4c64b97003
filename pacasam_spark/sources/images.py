"""Deterministic synthetic image+caption catalogue (BASELINE.json
input_hint: image_id, bytes, w, h, fmt, caption, phash).

Placement mirrors the patch-catalogue grid (FIXTURES.md §4): image i sits
at the grid cell of patch i, so file/cell stratification carries over.
Pixel content is a pure function of image_id (imaging.synth_pixels) —
reproducible at any partitioning, no stored fixtures.

Generation runs in mapInPandas (Arrow batches; the only per-image Python
is the numpy render+encode, vectorized per batch by necessity of the
codec) — the same shape a real ingest job has.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pacasam_spark import schemas as S
from pacasam_spark.operators.hashing import det_hash


def image_id_expr(idx, file_id) -> "F.Column":
    """Zero-padded image id "{file_id}-{%09d}" (format mirrors the
    reference's id concat, configs/Lipac_query.sql:113-115)."""
    return F.concat(file_id, F.lit("-"), F.lpad(idx.cast("string"), 9, "0"))


def synthetic_images(
    spark: SparkSession,
    n: int = 1000,
    size: int = 32,
    lossy_every: int = 4,
) -> DataFrame:
    """Image catalogue of n rows; every lossy_every-th image is stored in
    the lossy 'q6' tier, the rest as lossless 'png'."""
    g = math.ceil(math.sqrt(n))
    df = spark.range(n).select(
        F.col("id").alias("idx"),
        F.concat(
            ((F.col("id") / g).cast("long") * S.PATCH_SIZE_M / S.TILE_SIZE_M)
            .cast("long")
            .cast("string"),
            F.lit("_"),
            (F.pmod(F.col("id"), F.lit(g)) * S.PATCH_SIZE_M / S.TILE_SIZE_M)
            .cast("long")
            .cast("string"),
        ).alias(S.FILE_ID),
    )
    df = df.select(
        "idx",
        image_id_expr(F.col("idx"), F.col(S.FILE_ID)).alias("image_id"),
        F.when(F.pmod("idx", F.lit(lossy_every)) == 0, "q6")
        .otherwise("png")
        .alias("fmt"),
        det_hash("idx", seed=777).alias("phash"),
    )

    out_schema = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long"
    )

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pacasam_spark.imaging import encode, synth_pixels

        for pdf in batches:
            rows = []
            for image_id, fmt, phash in zip(pdf.image_id, pdf.fmt, pdf.phash):
                arr = synth_pixels(image_id, size, size)
                caption = (
                    f"synthetic scene {image_id} mean={int(arr.mean())} fmt={fmt}"
                )
                rows.append(
                    (image_id, encode(arr, fmt), size, size, fmt, caption, phash)
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
            )

    return df.mapInPandas(render, schema=out_schema)
