"""Tiling (patchification) and mosaic for the image catalogue.

The reference's extraction cuts ONE crop per sampling row
(reference: extractors/laz.py:131-149 crop-to-patch); tiling generalizes
that to the grid decomposition a pretraining pipeline needs — ViT-style
patch grids, tile-level perceptual-hash dedup indexes, sliding-window
inference sets.

Spark shape (the 100 TB lens):
- ``tile_images`` is a stateless ``mapInArrow`` scan — ZERO shuffles;
  output fans out rows x tiles with column-pruned input (only
  image_id/bytes/fmt cross the Python boundary). With
  ``with_bytes=False`` it emits a (image_id, tile_x, tile_y, phash)
  fingerprint index whose output bytes are negligible next to the scan.
- ``mosaic_tiles`` is the inverse: ONE hash-repartition on image_id +
  a JVM sort, then the sorted-stream Arrow run carver reassembles each
  frame (the same discipline as chunked FPS — no grouped-map framing
  overhead, peak Python memory is one image's tiles).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame

from pacasam_spark.operators.fps import carve_chunk_runs


def tile_grid(
    w: int,
    h: int,
    tile_w: int,
    tile_h: int,
    stride_x: int,
    stride_y: int,
    partial: str = "drop",
) -> list[tuple[int, int, int, int]]:
    """Tile origins for a (w, h) frame as (tile_x, tile_y, x0, y0).

    partial="drop": only tiles fully inside the frame.
    partial="pad": origins step by stride until the frame is covered;
    edge tiles read past the frame and are zero-padded to full size.
    """
    if partial not in ("drop", "pad"):
        raise ValueError(f"partial must be drop|pad, got {partial!r}")
    if partial == "drop":
        xs = range(0, w - tile_w + 1, stride_x)
        ys = range(0, h - tile_h + 1, stride_y)
    else:
        xs = range(0, w, stride_x)
        ys = range(0, h, stride_y)
    return [
        (tx, ty, x0, y0)
        for ty, y0 in enumerate(ys)
        for tx, x0 in enumerate(xs)
    ]


def tile_images(
    images: DataFrame,
    tile_w: int,
    tile_h: int,
    stride_x: int | None = None,
    stride_y: int | None = None,
    out_fmt: str | None = None,
    with_bytes: bool = True,
    with_phash: bool = False,
    partial: str = "drop",
) -> DataFrame:
    """One row per tile of every image: (image_id, tile_x, tile_y, x0,
    y0, w, h, fmt[, bytes][, phash]).

    stride defaults to the tile size (non-overlapping grid); a smaller
    stride gives overlapping tiles. out_fmt re-encodes tiles (default:
    source format). with_phash adds the 64-bit DCT perceptual hash of
    each tile's pixels (imaging.phash64) — with with_bytes=False this is
    the tile-fingerprint-index workload (near-dup detection at tile
    granularity) and moves no pixel bytes back to the JVM.
    """
    sx = stride_x or tile_w
    sy = stride_y or tile_h
    if min(tile_w, tile_h, sx, sy) <= 0:
        raise ValueError("tile and stride must be positive")
    if not (with_bytes or with_phash):
        raise ValueError("need at least one of with_bytes/with_phash")
    if partial not in ("drop", "pad"):
        raise ValueError(f"partial must be drop|pad, got {partial!r}")

    fields = (
        "image_id string, tile_x int, tile_y int, x0 int, y0 int, "
        "w int, h int, fmt string"
    )
    if with_bytes:
        fields += ", bytes binary"
    if with_phash:
        fields += ", phash long"

    def work(batches) -> Iterator:
        import pyarrow as pa

        from pacasam_spark.imaging import decode, encode, phash64_batch

        pa_fields = [
            ("image_id", pa.string()), ("tile_x", pa.int32()),
            ("tile_y", pa.int32()), ("x0", pa.int32()), ("y0", pa.int32()),
            ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
        ]
        if with_bytes:
            pa_fields.append(("bytes", pa.binary()))
        if with_phash:
            pa_fields.append(("phash", pa.int64()))
        out_schema = pa.schema(pa_fields)

        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column("image_id").to_pylist()
            fmts = batch.column("fmt").to_pylist()
            raw = batch.column("bytes")
            cols: dict[str, list] = {
                "image_id": [], "tile_x": [], "tile_y": [],
                "x0": [], "y0": [], "w": [], "h": [], "fmt": [],
            }
            if with_bytes:
                cols["bytes"] = []
            tile_stack: list[np.ndarray] = [] if with_phash else None
            for i, (iid, fmt) in enumerate(zip(ids, fmts)):
                arr = decode(raw[i].as_py(), fmt)
                ih, iw = arr.shape[:2]
                ofmt = out_fmt or fmt
                for tx, ty, x0, y0 in tile_grid(
                    iw, ih, tile_w, tile_h, sx, sy, partial
                ):
                    t = arr[y0 : y0 + tile_h, x0 : x0 + tile_w]
                    if t.shape[:2] != (tile_h, tile_w):  # pad edge tile
                        full = np.zeros((tile_h, tile_w, 3), np.uint8)
                        full[: t.shape[0], : t.shape[1]] = t
                        t = full
                    cols["image_id"].append(iid)
                    cols["tile_x"].append(tx)
                    cols["tile_y"].append(ty)
                    cols["x0"].append(x0)
                    cols["y0"].append(y0)
                    cols["w"].append(tile_w)
                    cols["h"].append(tile_h)
                    cols["fmt"].append(ofmt)
                    if with_bytes:
                        cols["bytes"].append(encode(t, ofmt))
                    if with_phash:
                        tile_stack.append(t)
            if with_phash:
                # one batched DCT per chunk (bit-identical to the scalar
                # loop — tests pin it); chunked so the float64 temps stay
                # bounded regardless of Arrow batch size
                hashes: list[np.ndarray] = []
                for s in range(0, len(tile_stack), 8192):
                    hashes.append(
                        phash64_batch(np.stack(tile_stack[s : s + 8192]))
                    )
                cols["phash"] = np.concatenate(hashes) if hashes else []
            yield pa.RecordBatch.from_pydict(cols, schema=out_schema)

    return images.select("image_id", "bytes", "fmt").mapInArrow(work, fields)


def mosaic_tiles(tiles: DataFrame, out_fmt: str = "png") -> DataFrame:
    """Reassemble frames from tiles: the inverse of ``tile_images``.

    Expects with_bytes=True tiles; the frame extent is the tile
    bounding box (max(x0)+tile_w, max(y0)+tile_h), so a stride that
    divides the image dimensions round-trips exactly (PSNR-lossy for
    lossy tile formats). Overlapping tiles paste in (y0, x0) order —
    later tiles win on the overlap band.

    Shape: one shuffle (hash-repartition on image_id) + JVM sort +
    streaming per-image reassembly via the Arrow run carver.
    """
    out_schema = "image_id string, bytes binary, w int, h int, fmt string"

    def process(tbl):
        import pyarrow as pa

        from pacasam_spark.imaging import decode, encode

        x0s = tbl.column("x0").to_numpy(zero_copy_only=False)
        y0s = tbl.column("y0").to_numpy(zero_copy_only=False)
        tws = tbl.column("w").to_numpy(zero_copy_only=False)
        ths = tbl.column("h").to_numpy(zero_copy_only=False)
        fmts = tbl.column("fmt").to_pylist()
        raw = tbl.column("bytes")
        fw = int((x0s + tws).max())
        fh = int((y0s + ths).max())
        canvas = np.zeros((fh, fw, 3), np.uint8)
        # rows arrive sorted by (y0, x0) — deterministic overlap winner
        for i in range(len(tbl)):
            t = decode(raw[i].as_py(), fmts[i])
            canvas[y0s[i] : y0s[i] + t.shape[0], x0s[i] : x0s[i] + t.shape[1]] = t
        return pa.table(
            {
                "image_id": [tbl.column("image_id")[0].as_py()],
                "bytes": [encode(canvas, out_fmt)],
                "w": [fw],
                "h": [fh],
                "fmt": [out_fmt],
            },
            schema=pa.schema([
                ("image_id", pa.string()), ("bytes", pa.binary()),
                ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
            ]),
        )

    return carve_chunk_runs(
        tiles.select("image_id", "tile_x", "tile_y", "x0", "y0", "w", "h",
                     "fmt", "bytes"),
        process,
        out_schema,
        sort_keys=("y0", "x0"),
        chunk_col="image_id",
    )
