"""GeoPackage source/sink without geopandas (S3 parity, round-6 verdict
item #2: the reference reads "any geopandas format" —
``connectors/geopandas.py:24-31`` — and writes one flat GeoPackage per
sampling run; this engine was parquet-only).

A GeoPackage is SQLite (OGC GPKG spec): ``gpkg_contents`` lists feature
tables, ``gpkg_geometry_columns`` names the geometry column, and
geometries are stored as a "GP" header (version, flags, srs_id,
optional envelope) followed by standard WKB. pacasam's catalogues are
BOXES-only (reference README.md:198 — patch bounding boxes), so the
reader surfaces each geometry as its envelope
``(geom_xmin, geom_ymin, geom_xmax, geom_ymax)`` — the same four
columns the rest of the engine (cells, zorder, extraction crops)
already speaks — taken from the GP header's envelope when present and
computed from the WKB points otherwise.

Scale shape: the read is partitioned by SQLite ``rowid`` ranges (the
same tiling as ``sources/jdbc.partition_ranges``) and executed in
``mapInPandas`` — each task opens the file read-only and scans only its
range, so a big catalogue file parallelizes across the cluster
(requires the path to be visible on every worker: shared FS / fuse
mount, like any file-based source here). The writer is a DRIVER-side
sink for sampling outputs, mirroring the reference's one-gpkg-per-run
(``connectors/geopandas.py`` + ``run_sampling.py:58``) — selections are
small by construction; big tables belong in parquet/snapshot tables.
"""

from __future__ import annotations

import math
import struct

from pyspark.sql import DataFrame, SparkSession

_GPKG_TO_SPARK = {
    "INTEGER": "long",
    "INT": "long",
    "MEDIUMINT": "long",
    "SMALLINT": "long",
    "TINYINT": "long",
    "BOOLEAN": "boolean",
    "REAL": "double",
    "DOUBLE": "double",
    "FLOAT": "double",
    "TEXT": "string",
    "BLOB": "binary",
    "DATE": "string",
    "DATETIME": "string",
}

# reference sampling-output columns dropped on read so a catalogue that
# came from a previous sampling can be re-sampled without conflicts
# (reference: connectors/geopandas.py:28-30)
_SAMPLING_COLS = ("split", "sampler")


def gpkg_envelope(blob: bytes) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) of one GPKG geometry blob: the GP
    header's envelope when recorded, else the bounding box of the WKB
    coordinates (Point/LineString/Polygon and their Multi/Collection
    forms, 2D+ — extra Z/M ordinates are skipped)."""
    if blob[:2] != b"GP":
        raise ValueError(f"not a GPKG geometry blob (magic {blob[:2]!r})")
    flags = blob[3]
    env_ind = (flags >> 1) & 0x7
    bo = "<" if flags & 0x1 else ">"
    n_env = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}[env_ind]
    off = 8
    if n_env:
        env = struct.unpack(f"{bo}{n_env}d", blob[off : off + n_env * 8])
        return (env[0], env[2], env[1], env[3])  # minx,maxx,miny,maxy order
    return _wkb_bbox(memoryview(blob), off + n_env * 8)[0]


def _wkb_bbox(buf: memoryview, off: int):
    """Bounding box of the WKB geometry at ``off``; returns (bbox, end)."""
    bo = "<" if buf[off] else ">"
    (gtype,) = struct.unpack_from(f"{bo}I", buf, off + 1)
    off += 5
    base = gtype % 1000  # ISO WKB: 1000/2000/3000 offsets mark Z/M/ZM
    ndim = 2 + (1 if gtype // 1000 in (1, 3) else 0) + (
        1 if gtype // 1000 in (2, 3) else 0
    )

    def points(n, off):
        xs, ys = [], []
        for _ in range(n):
            c = struct.unpack_from(f"{bo}{ndim}d", buf, off)
            xs.append(c[0])
            ys.append(c[1])
            off += 8 * ndim
        return xs, ys, off

    if base == 1:  # Point
        xs, ys, off = points(1, off)
    elif base == 2:  # LineString
        (n,) = struct.unpack_from(f"{bo}I", buf, off)
        xs, ys, off = points(n, off + 4)
    elif base == 3:  # Polygon
        (nrings,) = struct.unpack_from(f"{bo}I", buf, off)
        off += 4
        xs, ys = [], []
        for _ in range(nrings):
            (n,) = struct.unpack_from(f"{bo}I", buf, off)
            rx, ry, off = points(n, off + 4)
            xs += rx
            ys += ry
    elif base in (4, 5, 6, 7):  # Multi* / GeometryCollection: recurse
        (n,) = struct.unpack_from(f"{bo}I", buf, off)
        off += 4
        xs, ys = [], []
        for _ in range(n):
            (bb, off) = _wkb_bbox(buf, off)
            xs += [bb[0], bb[2]]
            ys += [bb[1], bb[3]]
    else:
        raise ValueError(f"unsupported WKB geometry type {gtype}")
    return (min(xs), min(ys), max(xs), max(ys)), off


def _feature_table(con, table: str | None) -> tuple[str, str]:
    """(feature table name, geometry column name) from the GPKG registry."""
    feats = [
        r[0]
        for r in con.execute(
            "select table_name from gpkg_contents where data_type='features'"
        )
    ]
    if table is None:
        if len(feats) != 1:
            raise ValueError(
                f"gpkg has {len(feats)} feature tables {feats}; pass table="
            )
        table = feats[0]
    elif table not in feats:
        raise ValueError(f"{table!r} is not a feature table (found {feats})")
    (geom_col,) = next(
        con.execute(
            "select column_name from gpkg_geometry_columns where table_name=?",
            (table,),
        )
    )
    return table, geom_col


def read_gpkg(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    n_partitions: int | None = None,
    drop_sampling_cols: bool = True,
    rows_per_partition: int = 200_000,
) -> DataFrame:
    """Distributed read of a GeoPackage feature table: attribute columns
    (SQLite declared types mapped to Spark types) + the geometry's
    envelope as ``geom_xmin/geom_ymin/geom_xmax/geom_ymax`` doubles.
    Partitioned by rowid ranges — each task scans only its slice.

    ``drop_sampling_cols`` mirrors the reference connector: ``split`` /
    ``sampler`` columns from a previous sampling output are dropped so
    the table can be re-sampled (connectors/geopandas.py:28-30)."""
    import sqlite3

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        table, geom_col = _feature_table(con, table)
        info = list(con.execute(f'PRAGMA table_info("{table}")'))
        attrs = []
        for _cid, name, decl, _nn, _dflt, _pk in info:
            if name == geom_col:
                continue
            if drop_sampling_cols and name.lower() in _SAMPLING_COLS:
                continue
            decl0 = (decl or "").split("(")[0].strip().upper()
            attrs.append((name, _GPKG_TO_SPARK.get(decl0, "string")))
        lo, hi, n = next(
            con.execute(f'select min(rowid), max(rowid), count(*) from "{table}"')
        )
    finally:
        con.close()

    schema = ", ".join(
        [f"{name} {t}" for name, t in attrs]
        + [f"geom_{b} double" for b in ("xmin", "ymin", "xmax", "ymax")]
    )
    if not n:
        return spark.createDataFrame([], schema)
    if n_partitions is None:
        n_partitions = max(1, min(64, math.ceil(n / rows_per_partition)))
    # rowid range tiling (same trunc-toward-zero arithmetic as
    # jdbc.partition_ranges' columnPartition twin, simplified: rowids
    # are >= 1 and dense enough for a linear split)
    step = max(1, (hi - lo + 1) // n_partitions + 1)
    ranges = [(lo + i * step, lo + (i + 1) * step - 1) for i in range(n_partitions)]
    ranges = [(a, b) for a, b in ranges if a <= hi]
    names = [name for name, _t in attrs]
    sql = (
        f'select {", ".join(chr(34) + c + chr(34) for c in names)}, '
        f'"{geom_col}" from "{table}" where rowid between ? and ?'
    )

    def read_ranges(batches):
        import pandas as pd

        c = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            for pdf in batches:
                for a, b in zip(pdf["a"], pdf["b"]):
                    rows = list(c.execute(sql, (int(a), int(b))))
                    if not rows:
                        continue
                    out = {
                        name: [r[i] for r in rows] for i, name in enumerate(names)
                    }
                    envs = [gpkg_envelope(r[-1]) for r in rows]
                    for j, b_name in enumerate(
                        ("geom_xmin", "geom_ymin", "geom_xmax", "geom_ymax")
                    ):
                        out[b_name] = [e[j] for e in envs]
                    yield pd.DataFrame(out)
        finally:
            c.close()

    rdf = spark.createDataFrame(ranges, "a long, b long").repartition(
        len(ranges), "a"
    )
    return rdf.mapInPandas(read_ranges, schema)


_SPARK_TO_GPKG = {
    "bigint": "INTEGER",
    "int": "MEDIUMINT",
    "smallint": "SMALLINT",
    "tinyint": "TINYINT",
    "boolean": "BOOLEAN",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "TEXT",
}


def gpkg_box_blob(
    xmin: float, ymin: float, xmax: float, ymax: float, srs_id: int
) -> bytes:
    """One GPKG geometry blob for a box polygon: GP header (version 0,
    little-endian, envelope indicator 1) + WKB Polygon with the closed
    5-point ring — byte-compatible with what OGR writes for pacasam's
    patch boxes."""
    header = b"GP\x00\x03" + struct.pack("<i4d", srs_id, xmin, xmax, ymin, ymax)
    ring = [
        (xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin)
    ]
    wkb = struct.pack("<BIII", 1, 3, 1, len(ring)) + b"".join(
        struct.pack("<2d", x, y) for x, y in ring
    )
    return header + wkb


def write_gpkg(
    df: DataFrame,
    path: str,
    table: str = "sampling",
    srs_id: int = 2154,
    bbox_cols: tuple[str, str, str, str] = (
        "geom_xmin", "geom_ymin", "geom_xmax", "geom_ymax",
    ),
) -> int:
    """Driver-side GeoPackage sink for SAMPLING-sized outputs (the
    reference writes one flat gpkg per run — connectors/geopandas.py +
    run_sampling.py:58): attribute columns are written as typed SQLite
    columns, ``bbox_cols`` become the box-polygon geometry. Returns the
    row count. Not for big tables — those belong in parquet/snapshot
    tables; this is the interchange format the reference ecosystem
    (QGIS inspection of a sampling) expects."""
    import os
    import sqlite3

    attrs = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if f.name not in bbox_cols
    ]
    rows = df.collect()
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute("PRAGMA application_id = 0x47504B47")  # 'GPKG'
        cur.execute("PRAGMA user_version = 10300")  # GPKG 1.3
        cur.execute(
            "create table gpkg_spatial_ref_sys (srs_name text not null, "
            "srs_id integer primary key, organization text not null, "
            "organization_coordsys_id integer not null, definition text "
            "not null, description text)"
        )
        cur.executemany(
            "insert into gpkg_spatial_ref_sys values (?,?,?,?,?,?)",
            [
                ("Undefined cartesian", -1, "NONE", -1, "undefined", None),
                ("Undefined geographic", 0, "NONE", 0, "undefined", None),
                (f"EPSG:{srs_id}", srs_id, "EPSG", srs_id, "undefined", None),
            ],
        )
        cur.execute(
            "create table gpkg_contents (table_name text not null primary "
            "key, data_type text not null, identifier text unique, "
            "description text default '', last_change datetime, min_x "
            "double, min_y double, max_x double, max_y double, srs_id "
            "integer)"
        )
        cur.execute(
            "create table gpkg_geometry_columns (table_name text not null, "
            "column_name text not null, geometry_type_name text not null, "
            "srs_id integer not null, z tinyint not null, m tinyint not "
            "null, primary key (table_name, column_name))"
        )
        cols_sql = ", ".join(
            f'"{name}" {_SPARK_TO_GPKG.get(t, "TEXT")}' for name, t in attrs
        )
        cur.execute(
            f'create table "{table}" (fid integer primary key autoincrement, '
            f"geom POLYGON, {cols_sql})"
        )
        xmn, ymn, xmx, ymx = bbox_cols
        ext = [math.inf, math.inf, -math.inf, -math.inf]
        ins = (
            f'insert into "{table}" (geom, '
            + ", ".join(f'"{n}"' for n, _t in attrs)
            + ") values ("
            + ",".join("?" * (len(attrs) + 1))
            + ")"
        )
        for r in rows:
            box = (r[xmn], r[ymn], r[xmx], r[ymx])
            ext = [
                min(ext[0], box[0]), min(ext[1], box[1]),
                max(ext[2], box[2]), max(ext[3], box[3]),
            ]
            cur.execute(
                ins,
                (gpkg_box_blob(*box, srs_id),)
                + tuple(r[name] for name, _t in attrs),
            )
        if not rows:
            ext = [None] * 4
        cur.execute(
            "insert into gpkg_contents (table_name, data_type, identifier, "
            "min_x, min_y, max_x, max_y, srs_id) values (?,?,?,?,?,?,?,?)",
            (table, "features", table, ext[0], ext[1], ext[2], ext[3], srs_id),
        )
        cur.execute(
            "insert into gpkg_geometry_columns values (?,?,?,?,0,0)",
            (table, "geom", "POLYGON", srs_id),
        )
        con.commit()
    finally:
        con.close()
    return len(rows)
