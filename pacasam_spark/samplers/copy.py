"""CopySampler (reference: samplers/copy.py:5-12): full copy,
split=NULL."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pacasam_spark import schemas as S
from pacasam_spark.samplers.base import Sampler


class CopySampler(Sampler):
    def get_patches(self) -> DataFrame:
        return (
            self.db.select(S.PATCH_ID)
            .withColumn(S.SPLIT, F.lit(None).cast("string"))
            .withColumn(S.SAMPLER, F.lit(self.name))
        )
