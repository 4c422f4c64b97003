"""Tiling/mosaic operator tests (extract/tiles.py): exact tile content
on the lossless path, edge padding, phash parity, overlap strides, and
the tile->mosaic round trip."""

import numpy as np
import pytest

from pacasam_spark.extract.tiles import mosaic_tiles, tile_grid, tile_images
from pacasam_spark.imaging import decode, phash64, psnr, synth_pixels
from pacasam_spark.sources.images import synthetic_images


def test_tile_grid_drop_and_pad():
    # 10x10 frame, 4x4 tiles, stride 4: drop -> 2x2 grid, pad -> 3x3
    assert tile_grid(10, 10, 4, 4, 4, 4, "drop") == [
        (0, 0, 0, 0), (1, 0, 4, 0), (0, 1, 0, 4), (1, 1, 4, 4)
    ]
    pad = tile_grid(10, 10, 4, 4, 4, 4, "pad")
    assert len(pad) == 9 and pad[-1] == (2, 2, 8, 8)
    # overlapping stride
    assert len(tile_grid(8, 8, 4, 4, 2, 2, "drop")) == 9


@pytest.fixture(scope="module")
def images(spark):
    return synthetic_images(spark, n=24, size=32).cache()


def test_tiles_exact_content_lossless(spark, images):
    tiles = tile_images(images, 16, 16).collect()
    assert len(tiles) == 24 * 4
    by_img = {}
    for r in images.collect():
        by_img[r.image_id] = decode(bytes(r.bytes), r.fmt)
    for t in tiles:
        src = by_img[t.image_id][t.y0 : t.y0 + 16, t.x0 : t.x0 + 16]
        got = decode(bytes(t.bytes), t.fmt)
        assert (t.w, t.h) == (16, 16)
        if t.fmt == "png":  # lossless: exact
            assert np.array_equal(got, src)
        else:  # q6 source: re-encode stays within the codec's PSNR tier
            assert psnr(got, src) >= 40.0


def test_tiles_phash_index_no_bytes(spark, images):
    tiles = tile_images(
        images, 16, 16, with_bytes=False, with_phash=True
    )
    assert "bytes" not in tiles.columns
    rows = tiles.collect()
    assert len(rows) == 24 * 4
    by_img = {
        r.image_id: decode(bytes(r.bytes), r.fmt) for r in images.collect()
    }
    for t in rows[:8]:
        src = by_img[t.image_id][t.y0 : t.y0 + 16, t.x0 : t.x0 + 16]
        assert t.phash == phash64(src)


def test_tiles_pad_covers_edges(spark, images):
    tiles = tile_images(images, 12, 12, partial="pad").collect()
    # 32/12 -> 3 origins per axis (0, 12, 24), last padded
    assert len(tiles) == 24 * 9
    edge = next(t for t in tiles if t.x0 == 24 and t.y0 == 24)
    arr = decode(bytes(edge.bytes), edge.fmt)
    assert arr.shape == (12, 12, 3)
    if edge.fmt == "png":
        assert (arr[8:, :] == 0).all() and (arr[:, 8:] == 0).all()


def test_tiles_overlapping_stride(spark, images):
    one = images.limit(1)
    tiles = tile_images(one, 16, 16, stride_x=8, stride_y=8).collect()
    assert len(tiles) == 9  # (32-16)/8+1 = 3 per axis
    assert {(t.tile_x, t.tile_y) for t in tiles} == {
        (x, y) for x in range(3) for y in range(3)
    }


def test_phash_batch_bit_identical():
    for size in (16, 32, 48, 64):
        from pacasam_spark.imaging import phash64_batch

        tiles = np.stack(
            [synth_pixels(f"pb{size}-{i}", size, size) for i in range(64)]
        )
        single = np.array([phash64(t) for t in tiles], dtype=np.int64)
        assert (phash64_batch(tiles) == single).all()


def test_mosaic_round_trip(spark, images):
    tiles = tile_images(images, 16, 16)  # keeps source fmt per image
    frames = {r.image_id: r for r in mosaic_tiles(tiles, "png").collect()}
    assert len(frames) == 24
    for r in images.collect():
        src = decode(bytes(r.bytes), r.fmt)
        out = frames[r.image_id]
        assert (out.w, out.h) == (32, 32)
        got = decode(bytes(out.bytes), "png")
        if r.fmt == "png":
            assert np.array_equal(got, src)
        else:  # q6 tiles re-decoded: lossy tier bound
            assert psnr(got, src) >= 40.0


def test_streaming_tile_index(spark, tmp_path):
    """tile_images is stateless mapInArrow, so it runs unchanged over a
    stream: file-source images -> tile-phash index, append mode. The
    streamed index must equal the batch index on the same rows."""
    imgs = synthetic_images(spark, n=20, size=32)
    src = str(tmp_path / "imgs")
    imgs.limit(12).write.mode("overwrite").parquet(src)
    imgs.subtract(imgs.limit(12)).write.mode("append").parquet(src)

    stream = spark.readStream.schema(imgs.schema).parquet(f"{src}/*.parquet")
    idx = tile_images(stream, 16, 16, with_bytes=False, with_phash=True)
    q = (
        idx.writeStream.format("memory")
        .queryName("tile_idx_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r.image_id, r.tile_x, r.tile_y, r.phash)
        for r in spark.table("tile_idx_stream").collect()
    )
    want = sorted(
        (r.image_id, r.tile_x, r.tile_y, r.phash)
        for r in tile_images(
            spark.read.parquet(src), 16, 16,
            with_bytes=False, with_phash=True,
        ).collect()
    )
    assert got == want and len(got) == 20 * 4


def test_mosaic_overlap_last_wins(spark):
    import pandas as pd
    from pacasam_spark.imaging import encode

    a = np.full((4, 4, 3), 10, np.uint8)
    b = np.full((4, 4, 3), 200, np.uint8)
    tiles = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["i", "i"],
                "tile_x": [0, 1], "tile_y": [0, 0],
                "x0": [0, 2], "y0": [0, 0],
                "w": [4, 4], "h": [4, 4],
                "fmt": ["png", "png"],
                "bytes": [encode(a, "png"), encode(b, "png")],
            }
        )
    )
    out = mosaic_tiles(tiles, "png").collect()[0]
    got = decode(bytes(out.bytes), "png")
    assert (out.w, out.h) == (6, 4)
    assert (got[:, :2] == 10).all()  # only tile a
    assert (got[:, 2:] == 200).all()  # overlap band: later (x0=2) wins
