"""File connectors (SURVEY.md §2.1 S3/S4, §2.2 K1).

Reference parity:
- GeopandasConnector (connectors/geopandas.py:24-31): read any tabular
  source, dropping stale ``split``/``sampler`` columns so the catalogue
  can be re-sampled.
- load_sampling + check_sampling_format (extractors/extractor.py:45-73):
  schema-validated sampling input for extraction.
- save_sampling (samplers/sampler.py:68-85): the reference writes to a
  tmp file then copies for atomicity on Samba; Spark's file-commit
  protocol (write to _temporary, atomic job commit) provides the same
  guarantee natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pacasam_spark import schemas as S


def read_catalogue(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """S3: load a catalogue file; stale sampling columns are dropped so
    re-sampling starts clean (reference: connectors/geopandas.py:28-31).
    ``fmt`` defaults by extension: ``.gpkg`` reads through the pure-python
    GeoPackage source (sources/geopkg.py — geometry surfaced as its
    envelope columns, like the reference's boxes-only catalogues), all
    else through the named Spark datasource (default parquet)."""
    if fmt is None:
        fmt = "gpkg" if path.endswith(".gpkg") else "parquet"
    if fmt == "gpkg":
        from pacasam_spark.sources.geopkg import read_gpkg

        return read_gpkg(spark, path)  # drops split/sampler itself
    df = spark.read.format(fmt).load(path)
    stale = [c for c in (S.SPLIT, S.SAMPLER) if c in df.columns]
    return df.drop(*stale) if stale else df


class SamplingFormatError(ValueError):
    pass


def check_sampling_format(df: DataFrame) -> None:
    """S4: sampling must carry patch_id + a string split (+ geometry box
    columns when destined for extraction)
    (reference: extractors/extractor.py:51-73)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    # patch_id for catalogue samplings; image_id for the image+caption
    # table (BASELINE.json input_hint) — either identifies the patch
    if S.PATCH_ID not in fields and "image_id" not in fields:
        raise SamplingFormatError(f"missing column {S.PATCH_ID!r} (or image_id)")
    if S.SPLIT not in fields:
        raise SamplingFormatError(f"missing column {S.SPLIT!r}")
    if not isinstance(fields[S.SPLIT], T.StringType):
        raise SamplingFormatError(
            f"column {S.SPLIT!r} must be string, got {fields[S.SPLIT]}"
        )


def load_sampling(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """S4: read + validate a sampling (reference: extractor.py:45-49)."""
    df = spark.read.format(fmt).load(path)
    check_sampling_format(df)
    return df


def save_sampling(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """K1: atomic sampling write — Spark's job-commit protocol stages
    output under _temporary and renames on success, the distributed
    equivalent of the reference's tmp-file-then-copy
    (samplers/sampler.py:68-85)."""
    df.write.mode("overwrite").format(fmt).save(path)
