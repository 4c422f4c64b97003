"""Dataset extraction entrypoint (reference: src/pacasam/run_extraction.py).

sampling parquet -> resume anti-join -> decode/crop/re-encode
(extractor from the registry) -> one {SPLIT}-{id}.{ext} file per patch
under dataset_root/split/, plus a manifest (checkpoint) and per-task
lineage metrics.

  python -m pacasam_spark.run_extraction \
      --sampling_path /tmp/s/sampling --images_path /tmp/images.parquet \
      --dataset_root_path /tmp/dataset --extractor_class ImagePatchExtractor

The reference parallelizes with --num_jobs processes
(run_extraction.py:43); here parallelism is the cluster itself —
--num-partitions controls task fan-out (spark-submit scales it to
executors).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F

from pacasam_spark.session import get_spark
from pacasam_spark.sources.files import load_sampling


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--sampling_path", required=True,
                   help="sampling parquet with (patch_id|image_id, split)")
    p.add_argument("--images_path", required=True,
                   help="image catalogue parquet (image_id, bytes, w, h, fmt, caption)")
    p.add_argument("-d", "--dataset_root_path", required=True)
    p.add_argument("--extractor_class", default="ImagePatchExtractor",
                   choices=["ImagePatchExtractor"])
    p.add_argument("--out_fmt", default=None, help="re-encode codec (default: keep)")
    p.add_argument("--crop", default=None, help="x0,y0,w,h crop window")
    p.add_argument("--resize", default=None,
                   help="w,h bilinear/block-mean resample after the crop")
    p.add_argument("--num-partitions", type=int, default=0,
                   help="repartition the work (0 = leave to the source/AQE)")
    return p


def run(args: argparse.Namespace) -> dict:
    from pacasam_spark.extract.filesink import write_patch_files
    from pacasam_spark.extract.images import extract_patches, resume_filter

    spark = get_spark(app_name=f"run_extraction_{args.extractor_class}")
    sampling = load_sampling(spark, args.sampling_path)
    if "image_id" not in sampling.columns:  # catalogue samplings key on patch_id
        sampling = sampling.withColumn(
            "image_id", F.col("patch_id").cast("string")
        )
    images = spark.read.parquet(args.images_path)

    manifest_dir = f"{args.dataset_root_path}/_manifest"
    try:
        manifest = spark.read.parquet(manifest_dir)
    except Exception:
        manifest = None
    todo = resume_filter(sampling.select("image_id", "split"), manifest)
    if args.num_partitions:
        todo = todo.repartition(args.num_partitions, "image_id")
    n_todo = todo.count()

    crop = tuple(int(v) for v in args.crop.split(",")) if args.crop else None
    resize = tuple(int(v) for v in args.resize.split(",")) if args.resize else None
    extracted = extract_patches(
        images, todo, crop=crop, resize=resize, out_fmt=args.out_fmt,
        sampling_rows=n_todo,
    ).persist()

    ext = args.out_fmt or "bin"
    files = write_patch_files(extracted, args.dataset_root_path, ext=ext)
    # ONE action for both metrics: `files` is a side-effecting writer —
    # two separate counts would run the write pass twice (the second one
    # finding every file already on disk and reporting written=0)
    row = files.agg(
        F.sum(F.col("written").cast("int")).alias("w"), F.count("*").alias("n")
    ).first()
    n_written, n_files = int(row["w"] or 0), int(row["n"])
    # manifest append LAST: writing to its path invalidates cached plans
    # that read it (recache-by-path)
    extracted.select("image_id").write.mode("append").parquet(manifest_dir)
    extracted.unpersist()

    summary = {
        "extractor": args.extractor_class,
        "written": n_written,
        "skipped_existing_files": n_files - n_written,
        # sampling rows whose image_id has no catalogue match never reach
        # the manifest (inner join) — surfaced here instead of silently
        # re-attempted on every resume forever
        "unmatched_ids": n_todo - n_files,
        "dataset_root": args.dataset_root_path,
    }
    print(json.dumps(summary))
    return summary


def main(argv: list[str] | None = None) -> None:
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
