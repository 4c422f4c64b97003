"""DiversitySampler (reference: samplers/diversity.py:10-100): normalize
the class-histogram features, then chunked farthest-point sampling for
even coverage of the feature space, chunks following the
(file_id, patch_id) spatial order.

The normalization statistics and FPS's per-file chunk counts ride ONE
grouped aggregation (``file_counts_key=file_id``), so the whole pipeline
reads the catalogue exactly twice: the fused stats/counts pass and the
chunk-carve pass — the round-5 stage decomposition showed the stats agg
is memory-bandwidth-bound, so removing the separate count scan shrinks
exactly the fraction that caps single-box scaling."""

from __future__ import annotations

from pyspark.sql import DataFrame

from pacasam_spark import schemas as S
from pacasam_spark.operators.fps import fps_sample
from pacasam_spark.operators.normalize import quantile_transform, standardize
from pacasam_spark.samplers.base import Sampler


class DiversitySampler(Sampler):
    def prepare(self) -> "DiversitySampler":
        """Run the normalization statistics pass NOW — the only driver
        barrier in this leg that does not depend on ``num_to_sample`` —
        so a composite sampler can overlap it with its other legs
        (guide §2.6 "overlap independent jobs": TripleSampler submits
        this from a thread while the targetted leg runs, and the stats
        scan hides under the targetted windows instead of serializing
        after them). Idempotent; ``get_patches`` reuses the result.
        Values are identical either way — same jobs, different order."""
        if getattr(self, "_prepared", None) is None:
            self._prepared = self._normalized_inputs()
        return self

    def _normalized_inputs(self):
        dcf = self.cf["DiversitySampler"]
        cols = list(dcf["columns"])

        db = self.db.select(S.PATCH_ID, S.FILE_ID, *cols)
        snap = dcf.get("manifest_stats")
        if snap:
            # catalogue is a snapshot table whose manifests carry the
            # exact normalization partials + per-file_id counts
            # (write_snapshot(norm_columns=, count_key=)): the stats
            # pass disappears and the ONLY data read left in the whole
            # pipeline is the FPS carve scan. Bit-identical to the
            # in-scan pass (tests/test_manifest_stats.py).
            if dcf.get("normalization", "standardization") != "standardization":
                raise ValueError(
                    "manifest_stats feeds standardization partials; the "
                    "quantile grid is not manifest-expressible — drop "
                    "manifest_stats for normalization=quantilization"
                )
            from pacasam_spark.sources.snapshots import snapshot_fps_inputs

            stats, counts = snapshot_fps_inputs(
                self.db.sparkSession,
                snap["dir"],
                cols,
                key=S.FILE_ID,
                version=snap.get("version"),
            )
            db = standardize(db, cols, stats=stats)
        elif dcf.get("normalization", "standardization") == "standardization":
            db, counts = standardize(db, cols, file_counts_key=S.FILE_ID)
        else:
            db, counts = quantile_transform(
                db,
                cols,
                n_quantiles=dcf.get("n_quantiles", 50),
                file_counts_key=S.FILE_ID,
            )
        return db, counts

    def get_patches(self, num_to_sample: int | None = None) -> DataFrame:
        if num_to_sample is None:
            num_to_sample = self.cf["target_total_num_patches"]
        dcf = self.cf["DiversitySampler"]
        cols = list(dcf["columns"])
        db, counts = (
            self._prepared
            if getattr(self, "_prepared", None) is not None
            else self._normalized_inputs()
        )

        sel = fps_sample(
            db,
            num_to_sample,
            feature_cols=cols,
            max_chunk_size=dcf.get("max_chunk_size_for_fps", 5000),
            counts=counts,
        ).select(S.PATCH_ID, S.FILE_ID)
        return self._finalize(sel, split_keys=S.FILE_ID)
