"""Train/val split assignment (SURVEY.md §2.12 P8).

Reference semantics (samplers/sampler.py:53-65): default split="test";
when frac_validation_set is truthy, all rows start as "train" and
floor(frac * n) patches — chosen by stratified sampling over ``keys`` —
flip to "val".
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pacasam_spark import schemas as S
from pacasam_spark.operators.sampling import sample_with_stratification


def assign_split(
    selection: DataFrame,
    frac_validation_set: float | None,
    keys: str | list[str] = S.FILE_ID,
    seed: int = 0,
) -> DataFrame:
    """Add the ``split`` column to a selection that still carries its
    stratification keys.

    Driver materialization barrier: one count() to size the val quota —
    same barrier the reference has (len() at sampler.py:60).
    """
    if not frac_validation_set:
        return selection.withColumn(S.SPLIT, F.lit("test"))
    # The selection is consumed three times (count, val-sample, join);
    # persisting caps the upstream pipeline (normalize/FPS/windows over the
    # full catalogue) at ONE execution instead of three.
    selection = selection.persist()
    n = selection.count()
    # epsilon guards float noise in rebalanced fractions, e.g.
    # (k/n)*n = k - 1e-12 must still floor to k
    n_val = math.floor(frac_validation_set * n + 1e-9)
    # n bounds every stratum size, so when the WHOLE selection is under
    # the salt threshold the skew guard provably cannot engage — pass
    # salt=0 to skip the auto-detection's per-strata count job (identical
    # output either way; guide §1.2: fewer driver barriers).
    from pacasam_spark.operators.sampling import _DEFAULT_SALT_THRESHOLD

    salt = 0 if n <= _DEFAULT_SALT_THRESHOLD else "auto"
    val_ids = (
        sample_with_stratification(
            selection, n_val, keys=keys, seed=seed, salt=salt
        )
        .select(S.PATCH_ID)
        .withColumn("__is_val", F.lit(True))
    )
    # val set is a small fraction of an already-small selection: broadcast.
    return (
        selection.join(F.broadcast(val_ids), on=S.PATCH_ID, how="left")
        .withColumn(
            S.SPLIT, F.when(F.col("__is_val"), F.lit("val")).otherwise(F.lit("train"))
        )
        .drop("__is_val")
    )
