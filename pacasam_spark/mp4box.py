"""ISO BMFF (MP4) demux in pure python — the real metadata path for
``mp4`` video payloads (multimodal columns: container parsing is REAL;
frame decode stays the documented stub because H.264 entropy decoding
needs ffmpeg-class libs absent here — ``video.CONTAINERS`` is the
swap-in point on a cluster that has them).

Implements the published ISO/IEC 14496-12 box structure: the box tree
walker handles 32/64-bit and to-end sizes; ``mp4_metadata`` reads
``mvhd`` (movie timescale/duration, v0+v1), per-track ``tkhd`` (display
w/h), ``mdhd`` (media timescale/duration), ``hdlr`` (handler), ``stsd``
(codec fourcc + visual dims / audio rate+channels) and ``stts`` (sample
count — frame count for video tracks).

``build_mp4`` writes a spec-valid minimal file (ftyp + moov + mdat) for
the same fields — the deterministic fixture generator for tests and the
metadata-only writer for pipelines that carry opaque encoded streams.
"""

from __future__ import annotations

import struct

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl",
    b"edts", b"dinf", b"mvex", b"udta",
}


def walk_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (type, body_start, box_end, depth) over the box tree."""
    stack = [(start, len(data) if end is None else end, 0)]
    while stack:
        off, stop, depth = stack.pop()
        while off + 8 <= stop:
            size, typ = struct.unpack_from(">I4s", data, off)
            hdr = 8
            if size == 1:
                (size,) = struct.unpack_from(">Q", data, off + 8)
                hdr = 16
            elif size == 0:
                size = stop - off
            if size < hdr or off + size > stop:
                raise ValueError(
                    f"malformed box {typ!r} at {off}: size {size}"
                )
            yield typ.decode("latin1"), off + hdr, off + size, depth
            if typ in _CONTAINERS:
                # descend first, then resume the remaining siblings
                stack.append((off + size, stop, depth))
                stack.append((off + hdr, off + size, depth + 1))
                off = stop
            else:
                off += size


def _fullbox(data: bytes, off: int) -> tuple[int, int]:
    (vf,) = struct.unpack_from(">I", data, off)
    return vf >> 24, off + 4  # (version, body offset)


def _mvhd(data, off):
    v, p = _fullbox(data, off)
    if v == 1:
        _c, _m, ts, dur = struct.unpack_from(">QQIQ", data, p)
    else:
        _c, _m, ts, dur = struct.unpack_from(">IIII", data, p)
    return ts, dur


def _tkhd(data, off):
    v, p = _fullbox(data, off)
    p += (8 + 8 + 4 + 4 + 8) if v == 1 else (4 + 4 + 4 + 4 + 4)
    p += 8 + 2 + 2 + 2 + 2 + 36  # reserved, layer, alt, volume, pad, matrix
    w, h = struct.unpack_from(">II", data, p)
    return w >> 16, h >> 16  # 16.16 fixed


def _mdhd(data, off):
    v, p = _fullbox(data, off)
    if v == 1:
        _c, _m, ts, dur = struct.unpack_from(">QQIQ", data, p)
        p += 28
    else:
        _c, _m, ts, dur = struct.unpack_from(">IIII", data, p)
        p += 16
    (lang,) = struct.unpack_from(">H", data, p)
    code = "".join(chr(((lang >> s) & 0x1F) + 0x60) for s in (10, 5, 0))
    return ts, dur, code


def _stsd_entry(data, off, end, handler):
    (count,) = struct.unpack_from(">I", data, off + 4)
    if not count:
        return {}
    p = off + 8
    _size, fourcc = struct.unpack_from(">I4s", data, p)
    entry = {"codec": fourcc.decode("latin1")}
    body = p + 8  # past SampleEntry size+fourcc
    if handler == "vide" and end - body >= 70:  # VisualSampleEntry >= 78
        w, h = struct.unpack_from(">HH", data, body + 8 + 16)
        entry["width"], entry["height"] = w, h
    elif handler == "soun" and end - body >= 20:  # AudioSampleEntry
        ch, _bits = struct.unpack_from(">HH", data, body + 8 + 8)
        (rate,) = struct.unpack_from(">I", data, body + 8 + 8 + 8)
        entry["channels"], entry["sample_rate"] = ch, rate >> 16
    return entry


def _stts_samples(data, off):
    (count,) = struct.unpack_from(">I", data, off + 4)
    total = 0
    for i in range(count):
        n, _delta = struct.unpack_from(">II", data, off + 8 + 8 * i)
        total += n
    return total


def mp4_metadata(data: bytes) -> dict:
    """Parsed movie-level + per-track metadata; raises ValueError when
    the payload is not ISO BMFF (no ftyp/moov leading box)."""
    lead = data[4:8]
    if lead not in (b"ftyp", b"moov", b"styp", b"wide", b"free"):
        raise ValueError("not an ISO BMFF (mp4) payload")
    out: dict = {"brand": None, "duration_sec": 0.0, "tracks": []}
    cur: dict | None = None
    movie_ts = 1
    for typ, body, end, depth in walk_boxes(data):
        if typ == "ftyp":
            out["brand"] = data[body : body + 4].decode("latin1")
        elif typ == "mvhd":
            movie_ts, dur = _mvhd(data, body)
            out["duration_sec"] = dur / movie_ts if movie_ts else 0.0
        elif typ == "trak":
            cur = {
                "handler": None, "codec": None, "n_samples": 0,
                "duration_sec": 0.0,
            }
            out["tracks"].append(cur)
        elif cur is not None:
            if typ == "tkhd":
                w, h = _tkhd(data, body)
                if w and h:
                    cur["width"], cur["height"] = w, h
            elif typ == "mdhd":
                ts, dur, lang = _mdhd(data, body)
                cur["timescale"] = ts
                cur["duration_sec"] = dur / ts if ts else 0.0
                cur["language"] = lang
            elif typ == "hdlr":
                cur["handler"] = data[body + 8 : body + 12].decode("latin1")
            elif typ == "stsd":
                # hdlr precedes stbl inside mdia (ISO 14496-12 ordering),
                # so the handler gates visual-vs-audio entry layout
                cur.update(_stsd_entry(data, body, end, cur["handler"]))
            elif typ == "stts":
                cur["n_samples"] = _stts_samples(data, body)
    for t in out["tracks"]:
        if t["handler"] == "vide" and t["duration_sec"]:
            t["fps"] = t["n_samples"] / t["duration_sec"]
    return out


# --------------------------------------------------------------------------
# writer — minimal spec-valid file (fixture generator / metadata carrier)
# --------------------------------------------------------------------------


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), typ) + payload


def _full(typ: bytes, version: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">I", version << 24) + payload)


def build_mp4(
    width: int = 64,
    height: int = 64,
    n_frames: int = 48,
    fps: int = 24,
    codec: str = "avc1",
    mdat: bytes = b"",
    timescale: int = 12288,
) -> bytes:
    """One video track, constant frame rate; ``mdat`` carries opaque
    sample bytes (this writer does not encode frames — H.264 encode is
    out of scope by design)."""
    delta = timescale // fps
    dur = n_frames * delta
    mvhd = _full(
        b"mvhd", 0,
        struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\0" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\0" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">I", (0 << 24) | 7)  # version 0, flags enabled
        + struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", dur)
        + b"\0" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0,
        struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">HH", 0x55C4, 0),  # 'und'
    )
    hdlr = _full(
        b"hdlr", 0, struct.pack(">I", 0) + b"vide" + b"\0" * 12 + b"\0"
    )
    sample_entry = (
        struct.pack(">I4s", 8 + 78, codec.encode("ascii"))
        + b"\0" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\0" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame count
        + b"\0" * 32  # compressor name
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, struct.pack(">III", 1, n_frames, delta))
    stsc = _full(b"stsc", 0, struct.pack(">IIII", 1, 1, n_frames, 1))
    size = len(mdat) // n_frames if n_frames and mdat else 0
    stsz = _full(b"stsz", 0, struct.pack(">III", size, n_frames, 0))
    stco = _full(b"stco", 0, struct.pack(">II", 1, 0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, struct.pack(">I", 1).rjust(8, b"\0"))
    dref = _full(
        b"dref", 0,
        struct.pack(">I", 1) + _full(b"url ", 0, b"")[:8]
        # url box with self-contained flag
        + struct.pack(">I", 1),
    )
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + moov + _box(b"mdat", mdat)
