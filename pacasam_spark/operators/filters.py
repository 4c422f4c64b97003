"""Filters / projections / dedup (SURVEY.md §2.3).

All are thin, declarative wrappers — Catalyst pushes them into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pacasam_spark import schemas as S


class UnexpectedNaNValuesError(ValueError):
    """Feature columns contain NaN/NULL before normalization
    (reference: exceptions.py:4-9, samplers/algos.py:71-73)."""


def filter_by_boolean_descriptor(df: DataFrame, name: str) -> DataFrame:
    """F1: keep rows where the boolean descriptor is true; dtype-checked
    (reference: connectors/connector.py:33-38)."""
    dtype = dict(zip(df.schema.names, df.schema.fields))[name].dataType
    if not isinstance(dtype, T.BooleanType):
        raise TypeError(f"descriptor {name!r} must be boolean, got {dtype}")
    return df.filter(F.col(name))


def project_patch_info(df: DataFrame, extra: list[str] | None = None) -> DataFrame:
    """F2: column pruning to [patch_id, file_id] (+extras)
    (reference: connectors/connector.py:16,38,42,46)."""
    return df.select(S.PATCH_ID, S.FILE_ID, *(extra or []))


def filter_split(df: DataFrame, split: str) -> DataFrame:
    """F3: split-filter truth table (reference: connectors/lipac.py:102-138).

    test  -> test IS TRUE
    train -> test IS NULL OR test IS FALSE   (NaN => train)
    any   -> passthrough
    """
    t = F.col(S.TEST_FLAG)
    if split == "test":
        return df.filter(t.eqNullSafe(F.lit(True)))
    if split == "train":
        return df.filter(t.isNull() | (t == F.lit(False)))
    if split == "any":
        return df
    raise ValueError(f"invalid split {split!r}; expected test|train|any")


def dedup_by_patch_id(df: DataFrame) -> DataFrame:
    """F4: dropDuplicates on the key (reference: samplers/sampler.py:42-51).

    NOTE: which duplicate survives is nondeterministic; when precedence
    matters use :func:`pacasam_spark.operators.union.union_dedup_priority`.
    """
    return df.dropDuplicates([S.PATCH_ID])


def exclude_ids(df: DataFrame, exclude: DataFrame, key: str = S.PATCH_ID) -> DataFrame:
    """F5/J2: anti-join exclusion — never a collected isin() list
    (reference: connectors/connector.py:40-42)."""
    return df.join(exclude.select(key), on=key, how="left_anti")


def assert_no_nan(df: DataFrame, cols: list[str]) -> None:
    """F10: NaN/NULL guard before normalization
    (reference: samplers/algos.py:71-73). One aggregate pass, not per-column
    actions."""
    conds = [
        F.sum((F.col(c).isNull() | F.isnan(F.col(c).cast("double"))).cast("int")).alias(c)
        for c in cols
    ]
    row = df.agg(*conds).first()
    bad = [c for c in cols if row[c] and row[c] > 0]
    if bad:
        raise UnexpectedNaNValuesError(f"NaN/NULL values in feature columns: {bad}")
