"""(Geo)TIFF codec + distributed raster extraction (SURVEY.md §2.1 S6;
reference: extractors/bd_ortho_vintage.py's rasterio windowed reads).
Wire-format checks: strips/tiles, deflate/none, predictor, LE/BE,
uint8/uint16/int16/float32, GeoTIFF transform, world-bbox windowing."""

import struct

import numpy as np
import pytest

from pacasam_spark.geotiff import (
    crop_geotiff,
    decode_tiff,
    encode_tiff,
    geo_transform,
    tiff_tags,
)

RNG = np.random.default_rng(42)


@pytest.mark.parametrize(
    "arr,kw",
    [
        (RNG.integers(0, 256, (67, 43, 3), dtype=np.uint8), {}),
        (RNG.integers(0, 256, (30, 50), dtype=np.uint8), {"compression": "none"}),
        (RNG.integers(0, 65535, (70, 70), dtype=np.uint16), {"tile": 32}),
        (RNG.normal(size=(40, 25)).astype(np.float32), {}),
        (RNG.integers(-3000, 3000, (33, 64), dtype=np.int16), {"tile": 16}),
        (RNG.integers(0, 256, (20, 20, 4), dtype=np.uint8), {}),
    ],
    ids=["rgb8-deflate", "gray8-raw", "u16-tiles", "f32", "i16-tiles", "rgba8"],
)
def test_tiff_round_trip(arr, kw):
    back = decode_tiff(encode_tiff(arr, **kw))
    assert back.shape == arr.shape and back.dtype == arr.dtype
    assert np.array_equal(back, arr)


def test_big_endian_decode():
    """A hand-built MM (big-endian) uncompressed gray file — the codec
    must honor the byte-order mark for both IFD values and pixels."""
    arr = np.arange(12, dtype=np.uint16).reshape(3, 4)
    ifd_off = 8
    entries = [
        (256, 3, 1, 4), (257, 3, 1, 3), (258, 3, 1, 16), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 8 + 2 + 12 * 9 + 4), (277, 3, 1, 1),
        (278, 4, 1, 3), (279, 4, 1, 24),
    ]
    buf = [struct.pack(">2sHI", b"MM", 42, ifd_off), struct.pack(">H", len(entries))]
    for tag, typ, cnt, val in entries:
        field = struct.pack(">H", val) + b"\0\0" if typ == 3 else struct.pack(">I", val)
        buf.append(struct.pack(">HHI", tag, typ, cnt) + field)
    buf.append(struct.pack(">I", 0))
    buf.append(arr.astype(">u2").tobytes())
    back = decode_tiff(b"".join(buf))
    assert np.array_equal(back, arr)


def test_geo_transform_and_world_crop():
    arr = np.arange(100 * 80, dtype=np.uint16).reshape(100, 80)
    g = (650000.0, 6860000.0, 0.5, 0.5)
    data = encode_tiff(arr, geo=g)
    assert geo_transform(data) == g
    win = crop_geotiff(
        data, (650000 + 5.0, 6860000 - 15.0, 650000 + 10.0, 6860000 - 10.0)
    )
    assert np.array_equal(win, arr[20:30, 10:20])


def test_geo_tags_absent_raises():
    data = encode_tiff(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="scale/tiepoint"):
        geo_transform(data)
    assert 33550 not in tiff_tags(data)


def test_imaging_codec_registry_round_trip():
    from pacasam_spark import imaging

    arr = RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    for fmt in ("tif", "tiff"):
        assert np.array_equal(imaging.decode(imaging.encode(arr, fmt), fmt), arr)


def test_distributed_raster_extraction(spark):
    """extract_raster_patches crops by world bbox exactly like the local
    windowed read, shifts each patch's geo origin to the crop corner,
    and emits one GeoTIFF per (file, patch)."""
    from pacasam_spark.extract.rasters import extract_raster_patches

    tiles = {}
    rows = []
    for i, fid in enumerate(["t1", "t2"]):
        px = RNG.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        geo = (1000.0 + 64 * i, 2000.0, 1.0, 1.0)
        tiles[fid] = (px, geo)
        rows.append((fid, bytearray(encode_tiff(px, geo=geo))))
    rasters = spark.createDataFrame(rows, "file_id string, bytes binary")
    sampling = spark.createDataFrame(
        [
            (1, "t1", "train", 1010.0, 1950.0, 1020.0, 1960.0),
            (2, "t1", "val", 1000.0, 1936.0, 1064.0, 2000.0),  # full tile
            (3, "t2", "train", 1070.0, 1990.0, 1080.0, 2000.0),
        ],
        "patch_id long, file_id string, split string, geom_xmin double,"
        " geom_ymin double, geom_xmax double, geom_ymax double",
    )
    got = {
        r["patch_id"]: r
        for r in extract_raster_patches(rasters, sampling).collect()
    }
    assert set(got) == {1, 2, 3}
    px1, _ = tiles["t1"]
    w1 = decode_tiff(bytes(got[1]["bytes"]))
    assert np.array_equal(w1, px1[40:50, 10:20])
    assert geo_transform(bytes(got[1]["bytes"])) == (1010.0, 1960.0, 1.0, 1.0)
    assert (got[2]["w"], got[2]["h"]) == (64, 64)
    assert np.array_equal(decode_tiff(bytes(got[2]["bytes"])), px1)
    px2, _ = tiles["t2"]
    assert np.array_equal(decode_tiff(bytes(got[3]["bytes"])), px2[0:10, 6:16])
