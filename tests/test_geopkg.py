"""GeoPackage source/sink (S3 parity: the reference's GeopandasConnector
reads gpkg catalogues — connectors/geopandas.py:24-31 — and every
sampling run writes one flat gpkg). Pure stdlib sqlite3 + struct: no
geopandas in the image."""

import os

import pytest
from pyspark.sql import functions as F

from pacasam_spark.sources.geopkg import (
    gpkg_box_blob,
    gpkg_envelope,
    read_gpkg,
    write_gpkg,
)

REF_GPKG = "/root/reference/tests/data/lefty_righty_sampling.gpkg"


def _sampling_df(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("patch_id"),
        F.concat(F.lit("file_"), (F.col("id") % 4)).alias("file_id"),
        F.when(F.col("id") % 10 == 0, "val").otherwise("train").alias("split"),
        (792000.0 + (F.col("id") % 8) * 50.0).alias("geom_xmin"),
        (6271000.0 + (F.col("id") / 8).cast("long") * 50.0).alias("geom_ymin"),
        (792000.0 + (F.col("id") % 8) * 50.0 + 50.0).alias("geom_xmax"),
        (6271000.0 + (F.col("id") / 8).cast("long") * 50.0 + 50.0).alias(
            "geom_ymax"
        ),
    )


def test_box_blob_roundtrips_envelope():
    blob = gpkg_box_blob(1.5, -2.0, 3.25, 4.0, srs_id=2154)
    assert blob[:2] == b"GP"
    assert gpkg_envelope(blob) == (1.5, -2.0, 3.25, 4.0)
    # envelope-free blob: header says no envelope, bbox comes from WKB
    import struct

    no_env = b"GP\x00\x01" + struct.pack("<i", 2154) + blob[40:]
    assert gpkg_envelope(no_env) == (1.5, -2.0, 3.25, 4.0)


def test_gpkg_write_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "sampling.gpkg")
    df = _sampling_df(spark)
    assert write_gpkg(df, path, table="sampling") == 40

    # split is a SAMPLING column: dropped by default (reference
    # connector behavior), kept on request
    back = read_gpkg(spark, path, drop_sampling_cols=False)
    cols = ["patch_id", "file_id", "split",
            "geom_xmin", "geom_ymin", "geom_xmax", "geom_ymax"]
    assert sorted(back.columns) == sorted(["fid"] + cols)
    a = sorted(map(tuple, df.select(*cols).collect()))
    b = sorted(map(tuple, back.select(*cols).collect()))
    assert a == b
    assert "split" not in read_gpkg(spark, path).columns

    # partitioned read == single-partition read (rowid tiling is exact)
    one = sorted(map(tuple, read_gpkg(spark, path, n_partitions=1).collect()))
    many = sorted(map(tuple, read_gpkg(spark, path, n_partitions=5).collect()))
    assert one == many
    # and the partitioned plan really fans out
    assert read_gpkg(spark, path, n_partitions=5).rdd.getNumPartitions() == 5


@pytest.mark.skipif(not os.path.exists(REF_GPKG), reason="reference data absent")
def test_reads_reference_fixture(spark):
    """Parity against the reference's committed sampling gpkg (written
    by geopandas/OGR): same rows, geometry envelopes inside the
    gpkg_contents extent recorded by OGR."""
    df = read_gpkg(spark, REF_GPKG, drop_sampling_cols=False)
    rows = df.orderBy("fid").collect()
    assert len(rows) == 4
    assert [(r["patch_id"], r["split"]) for r in rows] == [
        (0, "train"), (1, "val"), (2, "train"), (3, "val"),
    ]
    assert {r["file_id"] for r in rows} == {
        "792000_6272000-50mx100m-left",
        "792000_6272000-50mx100m-right",
    }
    # OGR recorded the dataset extent in gpkg_contents; every parsed
    # envelope must sit inside it
    for r in rows:
        assert 792000.0 <= r["geom_xmin"] <= r["geom_xmax"] <= 792100.0
        assert 6271171.0 <= r["geom_ymin"] <= r["geom_ymax"] <= 6271271.0
    # sampling columns drop on the catalogue path (re-sampling contract)
    assert "split" not in read_gpkg(spark, REF_GPKG).columns


def test_catalogue_path_dispatches_on_extension(spark, tmp_path):
    from pacasam_spark.sources.files import read_catalogue

    path = str(tmp_path / "cat.gpkg")
    write_gpkg(_sampling_df(spark, 12), path)
    db = read_catalogue(spark, path)
    assert db.count() == 12 and "split" not in db.columns

    # and a sampler runs straight off the gpkg catalogue
    from pacasam_spark.samplers import RandomSampler

    out = RandomSampler(
        db, {"target_total_num_patches": 5, "frac_validation_set": 0.2}
    ).get_patches()
    assert out.count() == 5
