"""SpatialSampler (reference: samplers/spatial.py:8-21): stratified-by-slab
sampling with optional exclusion of already-selected ids."""

from __future__ import annotations

from pyspark.sql import DataFrame

from pacasam_spark import schemas as S
from pacasam_spark.operators.filters import exclude_ids, project_patch_info
from pacasam_spark.operators.sampling import sample_with_stratification
from pacasam_spark.samplers.base import Sampler


class SpatialSampler(Sampler):
    def get_patches(
        self,
        num_to_sample: int | None = None,
        current_selection_ids: DataFrame | None = None,
        salt: int | str = "auto",
    ) -> DataFrame:
        """``salt``: forwarded to the stratified sampler. Callers that
        already know a per-stratum count bound (TripleSampler's shared
        probe — the completion draws from a SUBSET of the catalogue, so
        the catalogue's max stratum bounds it) pass the precomputed salt
        and skip the auto-detection's count job; output is identical
        either way."""
        if not num_to_sample:
            num_to_sample = self.cf["target_total_num_patches"]
        patches = project_patch_info(self.db)
        if current_selection_ids is not None:
            patches = exclude_ids(patches, current_selection_ids)
        sel = sample_with_stratification(
            patches, num_to_sample, keys=S.FILE_ID, seed=self.seed, salt=salt
        )
        return self._finalize(sel, split_keys=S.FILE_ID)
