"""Explicit StructType schemas for the engine's tables.

Geometry note: the reference supports only axis-aligned rectangles
(reference: connectors/connector.py:7, README.md:198), so geometry is a
flat struct of box corners — columnar, prunable, codegen-friendly — not an
opaque WKB blob.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Column-name constants (reference: connectors/connector.py:5-16,
# samplers/sampler.py:12-23)
PATCH_ID = "patch_id"
FILE_ID = "file_id"
SPLIT = "split"
SAMPLER = "sampler"
TEST_FLAG = "test"
SRID = "srid"

SPLIT_VALUES = ("train", "val", "test")

# Per-class point-count histogram columns
# (reference: connectors/synthetic.py:14-25)
NB_POINT_COLS = [
    "nb_total",
    "nb_sol",
    "nb_bati",
    "nb_vegetation_basse",
    "nb_vegetation_moyenne",
    "nb_vegetation_haute",
    "nb_pont",
    "nb_eau",
    "nb_sursol_perenne",
    "nb_non_classes",
]

# Spatial constants (reference: connectors/synthetic.py:27-30)
TILE_SIZE_M = 1000
PATCH_SIZE_M = 50
PATCHES_PER_TILE = (TILE_SIZE_M // PATCH_SIZE_M) ** 2  # 400
DEFAULT_SRID = 2154  # EPSG Lambert-93 (reference: connectors/synthetic.py:69)

GEOMETRY_FIELDS = [
    T.StructField("geom_xmin", T.DoubleType(), False),
    T.StructField("geom_ymin", T.DoubleType(), False),
    T.StructField("geom_xmax", T.DoubleType(), False),
    T.StructField("geom_ymax", T.DoubleType(), False),
]


def catalogue_schema(descriptor_names: list[str] | None = None) -> T.StructType:
    """The patch-catalogue table (reference: connectors/connector.py:5-16).

    descriptor_names: boolean indicator columns (default C0..C3 like the
    reference synthetic config, configs/Synthetic.yml:17-31).
    """
    if descriptor_names is None:
        descriptor_names = ["C0", "C1", "C2", "C3"]
    fields = [
        T.StructField(PATCH_ID, T.LongType(), False),
        T.StructField(FILE_ID, T.StringType(), False),
        *GEOMETRY_FIELDS,
        T.StructField(SRID, T.IntegerType(), True),
    ]
    fields += [T.StructField(c, T.BooleanType(), False) for c in descriptor_names]
    fields += [T.StructField(c, T.LongType(), False) for c in NB_POINT_COLS]
    fields += [T.StructField(TEST_FLAG, T.BooleanType(), True)]  # null => train
    return T.StructType(fields)


# Sampler output contract (reference: samplers/sampler.py:18-23)
SAMPLING_SCHEMA = T.StructType(
    [
        T.StructField(PATCH_ID, T.LongType(), False),
        T.StructField(SPLIT, T.StringType(), False),
        T.StructField(SAMPLER, T.StringType(), False),
    ]
)

# Target image+caption catalogue (BASELINE.json input_hint)
IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)
