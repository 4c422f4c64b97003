"""Raster <-> vector: rasterize polygon zones onto image patches
(SURVEY.md §2.4 J10 — reference: extractors/bd_ortho_vintage.py colorizes
orthophoto patches with vector data).

Spark mapping: the patch bbox rides each row (from the extraction join
against the catalogue geometry); the polygon set is tiny and ships in the
closure (the broadcast side). Inside ``mapInPandas`` each Arrow batch
decodes, computes a per-pixel even-odd ray-cast mask VECTORIZED over the
whole pixel grid (numpy row/col arrays against each polygon edge — no
per-pixel Python), alpha-blends the zone color, and re-encodes. The same
ray-cast rule as spatial/polygons.py, so a patch centroid inside a zone
(the join predicate) agrees with its center pixel being masked."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

Polygon = list[tuple[float, float]]

RASTERIZE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "n_masked long"
)


def rasterize_mask(
    w: int, h: int, bbox: tuple[float, float, float, float], verts: Polygon
) -> np.ndarray:
    """(h, w) bool mask: pixel CENTER inside the polygon (even-odd ray
    cast, vectorized over the grid; y axis: row 0 = ymin, north-up)."""
    xmin, ymin, xmax, ymax = bbox
    xs = xmin + (np.arange(w) + 0.5) * (xmax - xmin) / w
    ys = ymin + (np.arange(h) + 0.5) * (ymax - ymin) / h
    px = np.broadcast_to(xs[None, :], (h, w))
    py = np.broadcast_to(ys[:, None], (h, w))
    inside = np.zeros((h, w), dtype=bool)
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        straddles = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xhit = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        inside ^= straddles & (px < xhit)
    return inside


def colorize_patches(
    images: DataFrame,
    zones: list[tuple[str, Polygon]],
    color: tuple[int, int, int] = (255, 0, 0),
    alpha: float = 0.5,
) -> DataFrame:
    """J10: blend ``color`` into every pixel covered by any zone polygon.

    images: (image_id, bytes, fmt, geom_xmin, geom_ymin, geom_xmax,
    geom_ymax) — the shape the extraction join produces. Returns
    re-encoded patches plus the per-patch masked-pixel count (the
    rows-level invariant tests assert on).
    """
    polys = [verts for _, verts in zones]
    rgb = np.array(color, dtype=np.float64)

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pacasam_spark.imaging import decode, encode

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = decode(bytes(r.bytes), r.fmt)
                h, w = arr.shape[:2]
                bbox = (r.geom_xmin, r.geom_ymin, r.geom_xmax, r.geom_ymax)
                mask = np.zeros((h, w), dtype=bool)
                for verts in polys:
                    mask |= rasterize_mask(w, h, bbox, verts)
                out = arr.astype(np.float64)
                out[mask] = (1.0 - alpha) * out[mask] + alpha * rgb
                arr = np.clip(np.round(out), 0, 255).astype(np.uint8)
                rows.append(
                    (r.image_id, encode(arr, r.fmt), w, h, r.fmt, int(mask.sum()))
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "n_masked"]
            )

    cols = ["image_id", "bytes", "fmt",
            "geom_xmin", "geom_ymin", "geom_xmax", "geom_ymax"]
    return images.select(*cols).mapInPandas(work, schema=RASTERIZE_SCHEMA)
