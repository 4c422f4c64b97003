"""Extraction pipeline over image bytes (SURVEY.md §2.13 E1-E4 mapped to
the image+caption table) with resume manifest + per-partition lineage
metrics (north rule).

Reference semantics re-expressed:
- E1 per-file group-extract (extractors/laz.py:80-128) -> one
  ``mapInPandas`` pass; grouping by cell happens via the upstream
  partitioner, the decode is batched Arrow, no per-row Python calls into
  Spark.
- E2/E3 crop to a window + re-encode (extractors/bd_ortho_vintage.py:
  69-117; squares-only assert :76) -> numpy slicing inside the batch.
- K5 resume guard (extractors/laz.py:103-104, README.md:160) ->
  LEFT-ANTI JOIN against the manifest of already-extracted ids (never an
  output-file existence check per row — that is the single-node idiom).
- Lineage/metrics: each task appends one row (partition id, rows, bytes,
  wall time) via the TaskContext — the Iceberg-snapshot-metadata analogue
  on plain parquet.
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXTRACT_SCHEMA = (
    "image_id string, split string, bytes binary, w int, h int, fmt string, "
    "caption string"
)
METRICS_SCHEMA = (
    "partition_id int, n_rows long, n_bytes long, wall_sec double"
)


def extract_patches(
    images: DataFrame,
    sampling: DataFrame,
    crop: tuple[int, int, int, int] | None = None,
    resize: tuple[int, int] | None = None,
    out_fmt: str | None = None,
    sampling_rows: int | None = None,
    broadcast_threshold: int | None = None,
) -> DataFrame:
    """J1 extraction join + E2/E3 decode-crop-resize-encode.

    images: the catalogue (image_id, bytes, w, h, fmt, caption, phash).
    sampling: (image_id, split) selection — broadcast only when provably
    small (size-gated; a shuffle-hash join above the threshold, since
    run_extraction accepts arbitrary sampling parquet).
    sampling_rows: pass the count if already known to skip the size probe.
    crop: (x0, y0, cw, ch) window or None for full frames.
    resize: (out_w, out_h) bilinear/block-mean resample after the crop,
        or None to keep dimensions (training-pipeline thumbnail path).
    out_fmt: target codec (default: keep source format).
    """
    from pacasam_spark.operators.joins import (
        BROADCAST_ROW_THRESHOLD,
        selection_join,
    )

    joined = selection_join(
        images,
        sampling.select("image_id", "split"),
        "image_id",
        selection_rows=sampling_rows,
        broadcast_threshold=(
            BROADCAST_ROW_THRESHOLD
            if broadcast_threshold is None
            else broadcast_threshold
        ),
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pacasam_spark.imaging import decode, encode, resize_rgb

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = decode(bytes(r.bytes), r.fmt)
                if crop is not None:
                    x0, y0, cw, ch = crop
                    arr = arr[y0 : y0 + ch, x0 : x0 + cw]
                if resize is not None:
                    arr = resize_rgb(arr, resize[0], resize[1])
                fmt = out_fmt or r.fmt
                rows.append(
                    (
                        r.image_id,
                        r.split,
                        encode(arr, fmt),
                        arr.shape[1],
                        arr.shape[0],
                        fmt,
                        r.caption,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "split", "bytes", "w", "h", "fmt", "caption"],
            )

    return joined.mapInPandas(work, schema=EXTRACT_SCHEMA)


def compute_phash(images: DataFrame, out_col: str = "phash") -> DataFrame:
    """(image_id, phash) computed FROM PIXELS — the input_hint's
    ``phash:int64`` column populated by a real DCT perceptual hash
    (imaging.phash64): luma, 32x32 resample, 2D DCT, 8x8-coefficient
    median threshold. One Arrow-batched decode pass (mapInPandas, numpy
    per batch); join the result back on image_id, then feed
    operators.dedup.hamming_near_dup_pairs for image near-dup removal.
    Scale shape: embarrassingly parallel scan, zero shuffles."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pacasam_spark.imaging import decode, phash64

        for pdf in batches:
            hashes = [
                phash64(decode(bytes(b), f)) for b, f in zip(pdf.bytes, pdf.fmt)
            ]
            yield pd.DataFrame({"image_id": pdf.image_id, out_col: hashes})

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        work, schema=f"image_id string, {out_col} long"
    )


def resume_filter(sampling: DataFrame, manifest: DataFrame | None) -> DataFrame:
    """K5: drop ids already extracted (idempotent restart). The manifest
    is the checkpoint table — an anti-join, not a per-row file stat."""
    if manifest is None:
        return sampling
    return sampling.join(
        manifest.select("image_id").distinct(), "image_id", "left_anti"
    )


def run_extraction(
    images: DataFrame,
    sampling: DataFrame,
    out_dir: str,
    manifest_dir: str,
    metrics_dir: str | None = None,
    crop: tuple[int, int, int, int] | None = None,
    out_fmt: str | None = None,
) -> dict:
    """Full extraction with resume + lineage metrics.

    Writes: extracted patches partitioned by split (K3/K4 analogue),
    appends the processed ids to the manifest (checkpoint), and appends
    one metrics row per task. Returns summary counts.
    """
    spark = images.sparkSession
    try:
        manifest = spark.read.parquet(manifest_dir)
    except Exception:
        manifest = None

    todo = resume_filter(sampling, manifest)
    n_todo = todo.count()
    if n_todo == 0:
        return {"extracted": 0, "skipped_resume": sampling.count()}

    # persisted: consumed by up to three sinks (data, manifest, metrics) —
    # one decode pass, not three
    extracted = extract_patches(
        images, todo, crop=crop, out_fmt=out_fmt, sampling_rows=n_todo
    ).persist()

    metrics_rows: DataFrame | None = None
    if metrics_dir is not None:
        def with_metrics(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            t0 = time.perf_counter()
            n, nb = 0, 0
            for pdf in batches:
                n += len(pdf)
                nb += int(pdf["bytes"].map(len).sum()) if len(pdf) else 0
            pid = TaskContext.get().partitionId() if TaskContext.get() else -1
            yield pd.DataFrame(
                [(pid, n, nb, time.perf_counter() - t0)],
                columns=["partition_id", "n_rows", "n_bytes", "wall_sec"],
            )

        metrics_rows = extracted.mapInPandas(with_metrics, schema=METRICS_SCHEMA)

    # ORDER MATTERS: the manifest append must come LAST. Writing to
    # manifest_dir makes Spark recache-by-path and invalidate every plan
    # that read it — including our persisted `extracted` — so any action
    # issued afterwards would recompute against the UPDATED manifest and
    # see an empty anti-join.
    extracted.write.mode("append").partitionBy("split").parquet(out_dir)
    if metrics_rows is not None:
        metrics_rows.write.mode("append").parquet(metrics_dir)
    extracted.select("image_id").write.mode("append").parquet(manifest_dir)
    extracted.unpersist()
    return {"extracted": n_todo, "skipped_resume": sampling.count() - n_todo}
