"""End-to-end sampling entrypoint (reference: run_sampling.py).

catalogue -> sampler -> extraction join back to the catalogue -> parquet
sampling + comparison reports. The reference's gpkg tmp-copy atomicity
(sampler.py:68-85) maps to Spark's atomic directory commit protocol.

Usage:
  python -m pacasam_spark.run_sampling --sampler TripleSampler \
      --db-size 10000 --target 500 --output /tmp/sampling
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F

from pacasam_spark.plans.stats import write_comparison_reports
from pacasam_spark.samplers import SAMPLER_REGISTRY
from pacasam_spark.session import get_spark
from pacasam_spark.sources.synthetic import synthetic_catalogue

DEFAULT_CONFIG = {
    "target_total_num_patches": 500,
    "frac_validation_set": 0.1,
    "TargettedSampler": {
        "targets": {
            "C0": {"target_min_samples_proportion": 0.20},
            "C1": {"target_min_samples_proportion": 0.05},
            "C2": {"target_min_samples_proportion": 0.05},
            "C3": {"target_min_samples_proportion": 0.2},
        }
    },
    "DiversitySampler": {
        "max_chunk_size_for_fps": 5000,
        "normalization": "standardization",
        "columns": [
            "nb_sol", "nb_bati", "nb_vegetation_basse", "nb_vegetation_moyenne",
            "nb_vegetation_haute", "nb_pont", "nb_eau", "nb_sursol_perenne",
            "nb_non_classes",
        ],
    },
    "OutliersSampler": {
        "columns": [
            "nb_sol", "nb_bati", "nb_vegetation_basse", "nb_vegetation_moyenne",
            "nb_vegetation_haute", "nb_pont", "nb_eau", "nb_sursol_perenne",
            "nb_non_classes",
        ],
    },
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sampler", default="TripleSampler", choices=sorted(SAMPLER_REGISTRY))
    p.add_argument("--db-size", type=int, default=10000)
    p.add_argument("--target", type=int, default=500)
    p.add_argument("--output", required=True)
    p.add_argument("--split", default="train", choices=["train", "test", "any"])
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    spark = get_spark(app_name=f"run_sampling_{args.sampler}")
    cfg = json.loads(json.dumps(DEFAULT_CONFIG))
    cfg["target_total_num_patches"] = args.target

    from pacasam_spark.operators.filters import filter_split

    db = filter_split(
        synthetic_catalogue(spark, db_size=args.db_size, exact_counts=False),
        args.split,
    ).cache()

    sampler = SAMPLER_REGISTRY[args.sampler](db, cfg, seed=args.seed)
    sampling = sampler.get_patches().persist()

    # extraction join back to the full catalogue (J1;
    # reference: connectors/connector.py:48-51, run_sampling.py:58)
    extracted = db.join(F.broadcast(sampling), "patch_id")
    extracted.write.mode("overwrite").parquet(f"{args.output}/sampling")
    reports = write_comparison_reports(db, extracted, f"{args.output}/stats")
    n = sampling.count()
    print(json.dumps({"sampler": args.sampler, "n_sampled": n, "reports": reports}))


if __name__ == "__main__":
    main()
