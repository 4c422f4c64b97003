"""Pure-numpy (Geo)TIFF codec — the S6 raster read/write path, no
rasterio (reference: pacasam extractors/bd_ortho_vintage.py reads RGB/
IRC orthoimagery with rasterio windowed reads; this module gives the
same capability over opaque ``binary`` columns).

Wire format, not a lookalike: little- and big-endian baseline TIFF 6.0
with strip or tile organization, Compression 1 (none) / 8 or 32946
(zlib deflate), Predictor 1/2 (horizontal differencing), 1..4 samples
per pixel of uint8 / uint16 / int16 / uint32 / float32
(SampleFormat 1/2/3), PlanarConfiguration 1 (chunky). GeoTIFF
georeferencing via ModelPixelScale (33550) + ModelTiepoint (33922) and
a minimal GeoKeyDirectory (34735) — the origin/pixel-size transform
windowed raster extraction needs.

The encoder writes LE deflate strips (or square tiles) with optional
predictor-2 and geo tags; files round-trip through GDAL-style readers
since every structure is plain TIFF 6.0 / GeoTIFF 1.1.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# tag ids (TIFF 6.0 + GeoTIFF)
WIDTH, LENGTH = 256, 257
BITS, COMPRESSION, PHOTOMETRIC = 258, 259, 262
STRIP_OFFSETS, SAMPLES, ROWS_PER_STRIP, STRIP_COUNTS = 273, 277, 278, 279
PLANAR, PREDICTOR = 284, 317
TILE_W, TILE_L, TILE_OFFSETS, TILE_COUNTS = 322, 323, 324, 325
SAMPLE_FORMAT = 339
MODEL_PIXEL_SCALE, MODEL_TIEPOINT, GEO_KEYS = 33550, 33922, 34735

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 11: "f", 12: "d"}


def _read_values(data: bytes, e: str, typ: int, count: int, raw: bytes):
    size = _TYPE_SIZE[typ] * count
    if size > 4:
        (off,) = struct.unpack(e + "I", raw)
        buf = data[off : off + size]
    else:
        buf = raw[:size]
    if typ == 2:
        return buf.rstrip(b"\0").decode("ascii", "replace")
    if typ == 5:  # RATIONAL
        vals = struct.unpack(e + "II" * count, buf)
        return tuple(n / d if d else 0.0 for n, d in zip(vals[::2], vals[1::2]))
    return struct.unpack(e + _TYPE_FMT[typ] * count, buf)


def tiff_tags(data: bytes) -> dict[int, tuple]:
    """Parse the first IFD into {tag: values}; raises on non-TIFF."""
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, ifd_off = struct.unpack(e + "HI", data[2:8])
    if magic != 42:
        raise ValueError(f"not a TIFF: magic {magic}")
    (n,) = struct.unpack(e + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, tuple] = {}
    for i in range(n):
        o = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(e + "HHI", data[o : o + 8])
        if typ in _TYPE_SIZE:
            tags[tag] = _read_values(data, e, typ, count, data[o + 8 : o + 12])
    tags[-1] = (e,)  # byte order rides along for the pixel reader
    return tags


def _dtype(tags) -> np.dtype:
    bits = tags.get(BITS, (8,))[0]
    fmt = tags.get(SAMPLE_FORMAT, (1,))[0]
    kind = {1: "u", 2: "i", 3: "f"}[fmt]
    return np.dtype(f"{tags[-1][0]}{kind}{bits // 8}")


def _undo_predictor(block: np.ndarray, tags) -> np.ndarray:
    if tags.get(PREDICTOR, (1,))[0] == 2:
        np.cumsum(block, axis=1, out=block, dtype=block.dtype)
    return block


def _decompress(raw: bytes, comp: int) -> bytes:
    if comp == 1:
        return raw
    if comp in (8, 32946):
        return zlib.decompress(raw)
    raise NotImplementedError(f"TIFF compression {comp} not supported")


def decode_tiff(data: bytes) -> np.ndarray:
    """Pixels as (h, w) or (h, w, samples) ndarray."""
    tags = tiff_tags(data)
    w, h = tags[WIDTH][0], tags[LENGTH][0]
    spp = tags.get(SAMPLES, (1,))[0]
    comp = tags.get(COMPRESSION, (1,))[0]
    if tags.get(PLANAR, (1,))[0] != 1:
        raise NotImplementedError("planar TIFF not supported")
    dt = _dtype(tags)
    out = np.zeros((h, w, spp), dtype=dt)
    if TILE_OFFSETS in tags:
        tw, tl = tags[TILE_W][0], tags[TILE_L][0]
        per_row = (w + tw - 1) // tw
        for i, (off, cnt) in enumerate(
            zip(tags[TILE_OFFSETS], tags[TILE_COUNTS])
        ):
            raw = _decompress(data[off : off + cnt], comp)
            tile = np.frombuffer(raw, dtype=dt).reshape(tl, tw, spp).copy()
            _undo_predictor(tile, tags)
            ty, tx = (i // per_row) * tl, (i % per_row) * tw
            cy, cx = min(tl, h - ty), min(tw, w - tx)
            out[ty : ty + cy, tx : tx + cx] = tile[:cy, :cx]
    else:
        rps = tags.get(ROWS_PER_STRIP, (h,))[0]
        y = 0
        for off, cnt in zip(tags[STRIP_OFFSETS], tags[STRIP_COUNTS]):
            rows = min(rps, h - y)
            raw = _decompress(data[off : off + cnt], comp)
            strip = np.frombuffer(raw, dtype=dt).reshape(rows, w, spp).copy()
            out[y : y + rows] = _undo_predictor(strip, tags)
            y += rows
    return out[:, :, 0] if spp == 1 else out


def geo_transform(data_or_tags) -> tuple[float, float, float, float]:
    """(origin_x, origin_y, pixel_sx, pixel_sy) of pixel (0,0)'s outer
    corner, GeoTIFF raster-space convention: world_x = ox + col * sx,
    world_y = oy - row * sy (north-up, sy positive)."""
    tags = (
        data_or_tags
        if isinstance(data_or_tags, dict)
        else tiff_tags(data_or_tags)
    )
    if MODEL_PIXEL_SCALE not in tags or MODEL_TIEPOINT not in tags:
        raise ValueError("TIFF has no GeoTIFF scale/tiepoint tags")
    sx, sy = tags[MODEL_PIXEL_SCALE][:2]
    i, j, _k, x, y, _z = tags[MODEL_TIEPOINT][:6]
    return (x - i * sx, y + j * sy, sx, sy)


def crop_geotiff(data: bytes, bbox: tuple[float, float, float, float]) -> np.ndarray:
    """Windowed read by WORLD bbox (xmin, ymin, xmax, ymax) — the
    rasterio ``window=from_bounds(...)`` idiom of the reference's
    orthoimage extractor. Pixels whose CENTER falls inside the bbox are
    returned (rasterio's default window rounding at patch granularity)."""
    tags = tiff_tags(data)
    ox, oy, sx, sy = geo_transform(tags)
    arr = decode_tiff(data)
    h, w = arr.shape[:2]
    xmin, ymin, xmax, ymax = bbox
    c0 = max(0, int(np.ceil((xmin - ox) / sx - 0.5)))
    c1 = min(w, int(np.floor((xmax - ox) / sx - 0.5)) + 1)
    r0 = max(0, int(np.ceil((oy - ymax) / sy - 0.5)))
    r1 = min(h, int(np.floor((oy - ymin) / sy - 0.5)) + 1)
    return arr[r0:r1, c0:c1]


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

_SF = {"u": 1, "i": 2, "f": 3}


def encode_tiff(
    arr: np.ndarray,
    compression: str = "deflate",
    tile: int | None = None,
    geo: tuple[float, float, float, float] | None = None,
    predictor: int | None = None,
) -> bytes:
    """LE TIFF from an (h, w[, samples]) array. ``tile`` writes square
    tiles of that size instead of 64-row strips. ``geo`` stamps
    (origin_x, origin_y, sx, sy) as GeoTIFF tags. ``predictor`` defaults
    to 2 for integer samples (helps deflate on smooth imagery), 1 for
    float."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, spp = arr.shape
    dt = arr.dtype
    if dt.kind not in _SF:
        raise ValueError(f"unsupported dtype {dt}")
    if predictor is None:
        predictor = 2 if dt.kind in ("u", "i") else 1
    comp = 8 if compression == "deflate" else 1
    arr = np.ascontiguousarray(arr, dtype=dt.newbyteorder("<"))

    def pack(block: np.ndarray) -> bytes:
        if predictor == 2:
            block = np.concatenate(
                [block[:, :1], np.diff(block, axis=1)], axis=1
            ).astype(dt, copy=False)
        raw = block.tobytes()
        return zlib.compress(raw, 6) if comp == 8 else raw

    chunks: list[bytes] = []
    if tile:
        per_row = (w + tile - 1) // tile
        n_rows = (h + tile - 1) // tile
        for ty in range(n_rows):
            for tx in range(per_row):
                t = np.zeros((tile, tile, spp), dtype=dt)
                src = arr[ty * tile : ty * tile + tile, tx * tile : tx * tile + tile]
                t[: src.shape[0], : src.shape[1]] = src
                chunks.append(pack(t))
    else:
        rps = 64
        for y in range(0, h, rps):
            chunks.append(pack(arr[y : y + rps]))

    entries: list[tuple[int, int, tuple]] = [
        (WIDTH, 4, (w,)),
        (LENGTH, 4, (h,)),
        (BITS, 3, (dt.itemsize * 8,) * spp),
        (COMPRESSION, 3, (comp,)),
        (PHOTOMETRIC, 3, (2 if spp >= 3 else 1,)),
        (SAMPLES, 3, (spp,)),
        (PLANAR, 3, (1,)),
        (PREDICTOR, 3, (predictor,)),
        (SAMPLE_FORMAT, 3, (_SF[dt.kind],) * spp),
    ]
    if tile:
        entries += [(TILE_W, 3, (tile,)), (TILE_L, 3, (tile,))]
        off_tag, cnt_tag = TILE_OFFSETS, TILE_COUNTS
    else:
        entries.append((ROWS_PER_STRIP, 4, (64,)))
        off_tag, cnt_tag = STRIP_OFFSETS, STRIP_COUNTS
    if geo is not None:
        ox, oy, sx, sy = geo
        entries += [
            (MODEL_PIXEL_SCALE, 12, (float(sx), float(sy), 0.0)),
            (MODEL_TIEPOINT, 12, (0.0, 0.0, 0.0, float(ox), float(oy), 0.0)),
            # minimal GeoKeyDirectory: version 1.1.0, ModelTypeProjected,
            # RasterPixelIsArea — enough for GDAL to accept the transform
            (GEO_KEYS, 3, (1, 1, 0, 2, 1024, 0, 1, 1, 1025, 0, 1, 1)),
        ]

    # layout: header(8) | IFD | overflow values | chunk data
    n_entries = len(entries) + 2  # + offsets/counts arrays
    ifd_off = 8
    overflow_off = ifd_off + 2 + 12 * n_entries + 4
    overflow: list[bytes] = []

    def value_field(typ: int, vals: tuple) -> bytes:
        nonlocal overflow_off
        fmt = "<" + _TYPE_FMT[typ] * len(vals)
        raw = struct.pack(fmt, *vals)
        if len(raw) <= 4:
            return raw.ljust(4, b"\0")
        overflow.append(raw)
        ptr = struct.pack("<I", overflow_off)
        overflow_off += len(raw)
        return ptr

    # chunk offsets depend on overflow size: reserve overflow for the two
    # arrays first (counts always overflow when >1 chunk; offsets too)
    n = len(chunks)
    counts = tuple(len(c) for c in chunks)
    sizes = sum(
        0 if _TYPE_SIZE[t] * len(v) <= 4 else _TYPE_SIZE[t] * len(v)
        for t, v in ((t, v) for _, t, v in entries)
    )
    data_off = (
        ifd_off + 2 + 12 * n_entries + 4 + sizes + (8 * n if n > 1 else 0)
    )
    offs = []
    o = data_off
    for c in chunks:
        offs.append(o)
        o += len(c)
    entries.append((off_tag, 4, tuple(offs)))
    entries.append((cnt_tag, 4, counts))
    entries.sort(key=lambda t: t[0])

    out = [struct.pack("<2sHI", b"II", 42, ifd_off)]
    ifd = [struct.pack("<H", n_entries)]
    for tag, typ, vals in entries:
        ifd.append(
            struct.pack("<HHI", tag, typ, len(vals)) + value_field(typ, vals)
        )
    ifd.append(struct.pack("<I", 0))  # no next IFD
    out.extend(ifd)
    out.extend(overflow)
    out.extend(chunks)
    return b"".join(out)
