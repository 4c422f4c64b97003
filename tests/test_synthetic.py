"""Synthetic catalogue generator tests (reference semantics:
connectors/synthetic.py:45-113)."""

import math

from pyspark.sql import functions as F

from pacasam_spark import schemas as S
from pacasam_spark.sources.synthetic import synthetic_catalogue


def test_grid_geometry(catalogue):
    rows = catalogue.orderBy(S.PATCH_ID).limit(20).collect()
    g = math.ceil(math.sqrt(200))
    for r in rows:
        i = r[S.PATCH_ID]
        assert r["geom_xmin"] == (i // g) * 50
        assert r["geom_ymin"] == (i % g) * 50
        assert r["geom_xmax"] == r["geom_xmin"] + 50
        assert r["geom_ymax"] == r["geom_ymin"] + 50


def test_exact_prevalences_and_test_flag(catalogue):
    agg = catalogue.agg(
        *[F.sum(F.col(c).cast("int")).alias(c) for c in ["C0", "C1", "C2", "C3"]],
        F.sum(F.col(S.TEST_FLAG).cast("int")).alias("n_test"),
        F.sum(F.col(S.TEST_FLAG).isNull().cast("int")).alias("n_null"),
    ).first()
    assert agg["C0"] == math.ceil(0.005 * 200)
    assert agg["C1"] == math.ceil(0.2 * 200)
    assert agg["C3"] == math.ceil(0.7 * 200)
    assert agg["n_test"] == int(0.2 * 200)
    assert agg["n_null"] == 200 - int(0.2 * 200)  # never false, only true/null


def test_nb_columns_in_range(catalogue):
    mins = catalogue.agg(*[F.min(c).alias(c) for c in S.NB_POINT_COLS]).first()
    maxs = catalogue.agg(*[F.max(c).alias(c) for c in S.NB_POINT_COLS]).first()
    for c in S.NB_POINT_COLS:
        assert mins[c] >= 0
        assert maxs[c] < 60000


def test_file_id_slab_structure(spark):
    # 10000 patches -> grid 100x100 x 50m = 5km -> 5x5 slabs of 1km
    db = synthetic_catalogue(spark, db_size=10000, exact_counts=False)
    files = [r[S.FILE_ID] for r in db.select(S.FILE_ID).distinct().collect()]
    assert len(files) == 25
    counts = db.groupBy(S.FILE_ID).count().collect()
    assert all(r["count"] == 400 for r in counts)  # 400 patches per slab


def test_deterministic_across_partitionings(spark):
    a = synthetic_catalogue(spark, db_size=500).orderBy(S.PATCH_ID).collect()
    b = (
        synthetic_catalogue(spark.newSession(), db_size=500)
        .repartition(17)
        .orderBy(S.PATCH_ID)
        .collect()
    )
    assert a == b
