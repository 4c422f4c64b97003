"""Distributed GeoTIFF patch extraction (S6/E1 for the raster payload;
reference: ``extractors/bd_ortho_vintage.py`` — rasterio windowed reads
of RGB/IRC orthoimagery per patch, re-encoded per file).

Same shape as the LAS extractor (extract/pointclouds.py): the sampling
is aggregated to one patch-list row per ``file_id`` and broadcast-joined
to the raster table; a ``mapInPandas`` pass decodes each GeoTIFF ONCE,
crops every selected patch window out of it by WORLD bbox, and yields
one re-encoded GeoTIFF per patch whose origin is shifted to the crop
corner. Pixels never transit the driver; one task per raster file."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = (
    "patch_id long, file_id string, split string, w int, h int, bytes binary"
)


def extract_raster_patches(
    rasters: DataFrame, sampling: DataFrame
) -> DataFrame:
    """``rasters``: (file_id, bytes) GeoTIFF per file. ``sampling``:
    (patch_id, file_id, split, geom_xmin/ymin/xmax/ymax) in the same
    world CRS as the rasters' geo tags."""
    patches = sampling.groupBy("file_id").agg(
        F.collect_list(
            F.struct(
                "patch_id", "split",
                "geom_xmin", "geom_ymin", "geom_xmax", "geom_ymax",
            )
        ).alias("__patches")
    )
    joined = rasters.join(F.broadcast(patches), "file_id")

    def extract(batches):
        import numpy as np
        import pandas as pd

        from pacasam_spark.geotiff import (
            decode_tiff,
            encode_tiff,
            geo_transform,
            tiff_tags,
        )

        for pdf in batches:
            out = {k: [] for k in
                   ("patch_id", "file_id", "split", "w", "h", "bytes")}
            for _i, row in pdf.iterrows():
                data = bytes(row["bytes"])
                tags = tiff_tags(data)
                ox, oy, sx, sy = geo_transform(tags)
                arr = decode_tiff(data)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                h, w = arr.shape[:2]
                for p in row["__patches"]:
                    c0 = max(0, int(np.ceil((p["geom_xmin"] - ox) / sx - 0.5)))
                    c1 = min(w, int(np.floor((p["geom_xmax"] - ox) / sx - 0.5)) + 1)
                    r0 = max(0, int(np.ceil((oy - p["geom_ymax"]) / sy - 0.5)))
                    r1 = min(h, int(np.floor((oy - p["geom_ymin"]) / sy - 0.5)) + 1)
                    win = arr[r0:r1, c0:c1]
                    enc = encode_tiff(
                        win, geo=(ox + c0 * sx, oy - r0 * sy, sx, sy)
                    )
                    out["patch_id"].append(p["patch_id"])
                    out["file_id"].append(row["file_id"])
                    out["split"].append(p["split"])
                    out["w"].append(win.shape[1])
                    out["h"].append(win.shape[0])
                    out["bytes"].append(enc)
            yield pd.DataFrame(out)

    return joined.mapInPandas(extract, schema=OUT_SCHEMA)
