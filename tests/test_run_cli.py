"""CLI parity tests (reference: tests_pacasam/test_run_sampling.py:29-41,
test_run_extraction.py:10-79): YAML-config-driven sampling end-to-end and
extraction with {SPLIT}-{id} files + resume."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pacasam_spark.config import load_sampling_config
from pacasam_spark.extract.wms import fetch_with_retry, wms_extract

CONFIG = "/root/repo/configs/synthetic.yml"


def test_run_sampling_config_driven(spark, tmp_path):
    """The reference Synthetic.yml workflow: config + connector + sampler
    names -> sampling parquet with exactly target patches, stats reports,
    provenance copy of the config."""
    from pacasam_spark.run_sampling import main

    out = str(tmp_path / "out")
    main([
        "--config", CONFIG,
        "--connector_class", "SyntheticConnector",
        "--sampler_class", "TripleSampler",
        "--output", out,
    ])
    cfg = load_sampling_config(CONFIG)
    sampling = spark.read.parquet(
        f"{out}/SyntheticConnector-TripleSampler-train"
    )
    assert sampling.count() == cfg["target_total_num_patches"]
    assert {"patch_id", "split", "sampler"}.issubset(set(sampling.columns))
    # extraction join carried the full catalogue row
    assert "nb_sol" in sampling.columns
    assert os.path.exists(f"{out}/synthetic.yml")  # provenance
    assert os.path.isdir(f"{out}/stats")


def test_run_sampling_each_sampler_class(spark, tmp_path):
    from pacasam_spark.run_sampling import main

    for sampler in ("RandomSampler", "TargettedSampler"):
        out = str(tmp_path / sampler)
        main([
            "--config", CONFIG,
            "--sampler_class", sampler,
            "--output", out,
        ])
        n = spark.read.parquet(f"{out}/SyntheticConnector-{sampler}-train").count()
        assert n == 50


@pytest.fixture()
def sampling_and_images(spark, tmp_path):
    from pacasam_spark.sources.images import synthetic_images

    images = synthetic_images(spark, n=40, size=8)
    images_path = str(tmp_path / "images.parquet")
    images.write.parquet(images_path)
    sampling = images.select("image_id").limit(20).withColumn(
        "split", F.when(F.col("image_id").substr(-1, 1) < "5", "train").otherwise("val")
    )
    sampling_path = str(tmp_path / "sampling")
    sampling.write.parquet(sampling_path)
    return sampling_path, images_path


def test_run_extraction_cli_and_resume(spark, tmp_path, sampling_and_images):
    """{SPLIT}-{id}.{ext} files under split dirs; a second run extracts
    nothing (manifest resume) and overwrites no file (existence skip)."""
    from pacasam_spark.run_extraction import main

    sampling_path, images_path = sampling_and_images
    root = str(tmp_path / "dataset")
    from pacasam_spark.run_extraction import build_parser as bp, run as r

    summary1 = r(bp().parse_args([
        "-s", sampling_path, "--images_path", images_path,
        "-d", root, "--out_fmt", "png",
    ]))
    # the writer pass must run ONCE: a fresh run writes everything and
    # skips nothing (a second execution of the writer stage would report
    # written=0/skipped=20 for the same rows)
    assert summary1["written"] == 20
    assert summary1["skipped_existing_files"] == 0
    assert summary1["unmatched_ids"] == 0
    written = [
        os.path.join(d, f)
        for d, _, fs in os.walk(root)
        for f in fs
        if f.endswith(".png")
    ]
    assert len(written) == 20
    assert all(os.path.basename(p).split("-")[0] in ("TRAIN", "VAL") for p in written)
    mtimes = {p: os.path.getmtime(p) for p in written}

    from pacasam_spark.run_extraction import run, build_parser

    summary2 = run(build_parser().parse_args([
        "-s", sampling_path, "--images_path", images_path,
        "-d", root, "--out_fmt", "png",
    ]))
    assert summary2["written"] == 0  # resume: nothing re-extracted
    assert {p: os.path.getmtime(p) for p in written} == mtimes


def test_run_extraction_reports_unmatched_ids(spark, tmp_path, sampling_and_images):
    """Sampling ids with no catalogue match are dropped by the inner
    extraction join; the summary must surface them instead of silently
    re-attempting them on every resume run forever."""
    from pacasam_spark.run_extraction import build_parser, run

    sampling_path, images_path = sampling_and_images
    ghost = spark.createDataFrame(
        [("nonexistent_1", "train"), ("nonexistent_2", "val")],
        "image_id string, split string",
    )
    mixed = spark.read.parquet(sampling_path).unionByName(ghost)
    mixed_path = str(tmp_path / "sampling_mixed")
    mixed.write.parquet(mixed_path)

    summary = run(build_parser().parse_args([
        "-s", mixed_path, "--images_path", images_path,
        "-d", str(tmp_path / "dataset2"), "--out_fmt", "png",
    ]))
    assert summary["written"] == 20
    assert summary["unmatched_ids"] == 2


def test_wms_fetch_bounded_retry(spark):
    """reference bd_ortho_today.py:67-77: flaky service succeeds within
    the retry budget; permanent failure is a per-row error, not a task
    abort."""
    calls = {}

    def flaky(image_id, bbox):
        calls[image_id] = calls.get(image_id, 0) + 1
        if image_id == "dead":
            raise IOError("always down")
        if calls[image_id] < 3:
            raise IOError("transient")
        return f"{image_id}:{bbox[0]}".encode()

    payload, attempts, err = fetch_with_retry(flaky, "ok", (0, 0, 1, 1), max_retries=3)
    assert payload == b"ok:0" and attempts == 3 and err is None

    sampling = spark.createDataFrame(
        [("a", "train", 0.0, 0.0, 1.0, 1.0), ("dead", "train", 1.0, 0.0, 2.0, 1.0)],
        "image_id string, split string, geom_xmin double, geom_ymin double,"
        " geom_xmax double, geom_ymax double",
    )
    rows = {r["image_id"]: r for r in wms_extract(sampling, flaky, max_retries=2).collect()}
    assert rows["a"]["bytes"] is not None and rows["a"]["error"] is None
    assert rows["dead"]["bytes"] is None and "always down" in rows["dead"]["error"]
    assert rows["dead"]["n_attempts"] == 3  # 1 + max_retries


def test_run_sampling_bucketed_connector(spark, tmp_path):
    """BucketedConnector: the scale layout drives the same config
    workflow — selection identical to the plain-parquet connector run
    (same seed, same data, different physical layout)."""
    from pacasam_spark.run_sampling import main
    from pacasam_spark.sources.bucketed import write_bucketed_catalogue
    from pacasam_spark.sources.synthetic import synthetic_catalogue

    bucket_dir = str(tmp_path / "bucketed_cat")
    plain_dir = str(tmp_path / "plain_cat")
    db = synthetic_catalogue(spark, db_size=200)
    db.write.mode("overwrite").parquet(plain_dir)
    write_bucketed_catalogue(db, "cli_bucketed_cat", bucket_dir, n_buckets=4)
    spark.sql("DROP TABLE IF EXISTS cli_bucketed_cat")

    cfg = f"""
target_total_num_patches: 50
frac_validation_set: 0.1
connector_kwargs:
  path: {bucket_dir}
  table: cli_bucketed_adopted
  n_buckets: 4
DiversitySampler:
  max_chunk_size_for_fps: 100
  normalization: standardization
  columns: [nb_sol, nb_bati, nb_eau]
"""
    cfg_path = str(tmp_path / "bucketed.yml")
    with open(cfg_path, "w") as fh:
        fh.write(cfg)
    out = str(tmp_path / "out_bucketed")
    main([
        "--config", cfg_path,
        "--connector_class", "BucketedConnector",
        "--sampler_class", "DiversitySampler",
        "--output", out,
    ])
    sel_b = spark.read.parquet(f"{out}/BucketedConnector-DiversitySampler-any")
    assert sel_b.count() == 50

    cfg_plain = cfg.replace(f"path: {bucket_dir}", f"path: {plain_dir}").replace(
        "  table: cli_bucketed_adopted\n  n_buckets: 4\n", ""
    )
    cfg_plain_path = str(tmp_path / "plain.yml")
    with open(cfg_plain_path, "w") as fh:
        fh.write(cfg_plain)
    out2 = str(tmp_path / "out_plain")
    main([
        "--config", cfg_plain_path,
        "--connector_class", "GeopandasConnector",
        "--sampler_class", "DiversitySampler",
        "--output", out2,
    ])
    sel_p = spark.read.parquet(f"{out2}/GeopandasConnector-DiversitySampler-any")
    assert sorted(r["patch_id"] for r in sel_b.collect()) == sorted(
        r["patch_id"] for r in sel_p.collect()
    )
    spark.sql("DROP TABLE IF EXISTS cli_bucketed_adopted")


def test_run_sampling_snapshot_dir(spark, tmp_path):
    """--snapshot-dir commits each run as the next version of a
    snapshot table: atomic manifest, lineage, time-travel reads."""
    from pacasam_spark.run_sampling import build_parser, run
    from pacasam_spark.sources.snapshots import read_snapshot, snapshots

    out = str(tmp_path / "out")
    snap = str(tmp_path / "snaps")
    argv = [
        "--output", out, "--snapshot-dir", snap,
        "--db-size", "400", "--target", "60",
    ]
    s1 = run(build_parser().parse_args(argv + ["--seed", "1"]))
    s2 = run(build_parser().parse_args(argv + ["--seed", "2"]))
    assert (s1["snapshot_version"], s2["snapshot_version"]) == (1, 2)

    hist = snapshots(snap)
    assert [m["version"] for m in hist] == [1, 2]
    assert all(m["row_count"] == 60 for m in hist)
    assert hist[0]["metadata"]["seed"] == 1
    assert hist[0]["metadata"]["config_fingerprint"] != \
        hist[1]["metadata"]["config_fingerprint"]  # seed is in the hash
    v1 = read_snapshot(spark, snap, version=1)
    latest = read_snapshot(spark, snap)
    assert v1.count() == 60 and latest.count() == 60
    # different seeds really selected different patches
    ids1 = {r["patch_id"] for r in v1.select("patch_id").collect()}
    ids2 = {r["patch_id"] for r in latest.select("patch_id").collect()}
    assert ids1 != ids2


def test_run_sampling_catalogue_table(spark, tmp_path):
    """--catalogue-table reads the catalogue from a snapshot table and,
    when the manifests carry normalization partials + file_id counts,
    auto-wires manifest_stats so Diversity selects IDENTICALLY to the
    in-scan connector path with zero stats scans."""
    from pacasam_spark.run_sampling import DEFAULT_CONFIG, build_parser, run
    from pacasam_spark.sources.snapshots import write_snapshot
    from pacasam_spark.sources.synthetic import synthetic_catalogue

    cols = DEFAULT_CONFIG["DiversitySampler"]["columns"]
    tbl = str(tmp_path / "cat_tbl")
    write_snapshot(
        synthetic_catalogue(spark, db_size=2000, exact_counts=False),
        tbl,
        norm_columns=cols,
        count_key="file_id",
    )
    s = run(build_parser().parse_args([
        "--catalogue-table", tbl, "--sampler", "DiversitySampler",
        "--output", str(tmp_path / "o1"), "--target", "100",
    ]))
    assert s["n_sampled"] == 100

    # same selection as the plain synthetic-connector run (the snapshot
    # round-trip and the manifest-fed stats change nothing)
    s2 = run(build_parser().parse_args([
        "--sampler", "DiversitySampler", "--split", "any",
        "--output", str(tmp_path / "o2"),
        "--db-size", "2000", "--target", "100",
    ]))
    a = spark.read.parquet(s["sampling_path"]).select("patch_id", "split")
    b = spark.read.parquet(s2["sampling_path"]).select("patch_id", "split")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_run_sampling_zorder_snapshot(spark, tmp_path):
    """--zorder clusters the committed snapshot on the Morton curve of
    the geometry columns and records per-file min/max bounds; a box
    query via read_snapshot(bounds=...) then returns exactly the rows a
    full scan + filter does (pruning is file-granular and exact)."""
    from pyspark.sql import functions as F

    from pacasam_spark.run_sampling import build_parser, run
    from pacasam_spark.sources.snapshots import read_snapshot, snapshots

    snap = str(tmp_path / "zsnaps")
    s = run(build_parser().parse_args([
        "--output", str(tmp_path / "out"), "--snapshot-dir", snap,
        "--db-size", "2000", "--target", "400",
        "--zorder", "geom_xmin,geom_ymin", "--zorder-files", "8",
    ]))
    assert s["snapshot_version"] == 1
    m = snapshots(snap)[-1]
    assert m["metadata"]["layout"] == "zorder(geom_xmin,geom_ymin)"
    assert set(m["file_stats"]) == set(m["files"])
    assert all(set(st) == {"geom_xmin", "geom_ymin"} for st in m["file_stats"].values())

    full = read_snapshot(spark, snap)
    lo, hi = full.agg(F.min("geom_xmin"), F.max("geom_xmin")).first()
    bounds = {"geom_xmin": (lo, lo + (hi - lo) * 0.2)}
    pred = F.col("geom_xmin").between(*bounds["geom_xmin"])
    want = sorted(r["patch_id"] for r in full.filter(pred).collect())
    got = sorted(
        r["patch_id"]
        for r in read_snapshot(spark, snap, bounds=bounds).filter(pred).collect()
    )
    assert got == want and len(got) > 0


def test_run_curation_cli_end_to_end(spark, tmp_path):
    """run_curation (round-5 verdict #5): documents parquet -> Gopher
    quality funnel CSV -> minhash near-dedup -> atomic corpus parquet +
    snapshot version, with the JSON funnel summary. Every doc is planted
    twice, so exactly half the quality survivors remain after dedup."""
    from pacasam_spark.run_curation import main as curation_main
    from pacasam_spark.sources.snapshots import read_snapshot, snapshots

    base = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    corpus = base.unionByName(
        base.select((F.col("doc_id") + 5000).alias("doc_id"), "text")
    )
    inp = str(tmp_path / "docs.parquet")
    corpus.write.parquet(inp)

    cfg_path = str(tmp_path / "curation.yml")
    with open(cfg_path, "w") as fh:
        fh.write(
            "quality:\n"
            "  min_words: 3\n"
            "  min_stopword_hits: 0\n"
            "dedup:\n"
            "  method: minhash\n"
            "  jaccard_threshold: 0.7\n"
        )

    out = str(tmp_path / "curated")
    snap = str(tmp_path / "corpus_tbl")
    curation_main([
        "--config", cfg_path,
        "--input", inp,
        "--output", out,
        "--snapshot-dir", snap,
    ])

    curated = spark.read.parquet(f"{out}/corpus")
    n_final = curated.count()
    # identical copies: quality flags agree within each pair, minhash
    # catches every exact dup -> exactly half the survivors remain, and
    # the kept id is always the component minimum (the original doc)
    assert 0 < n_final <= 60
    assert curated.filter(F.col("doc_id") >= 5000).count() == 0
    # funnel CSV exists and covers every ok_* rule in order
    import glob

    csvs = glob.glob(f"{out}/stats/gopher-attrition/*.csv")
    assert csvs
    funnel = spark.read.option("header", True).csv(csvs[0])
    assert funnel.count() >= 5
    assert os.path.exists(f"{out}/curation.yml")  # provenance

    # snapshot committed with the funnel counts in its metadata
    hist = snapshots(snap)
    assert len(hist) == 1
    meta = hist[0]["metadata"]
    assert meta["method"] == "minhash" and meta["n_final"] == n_final
    assert meta["n_input"] == 120
    assert read_snapshot(spark, snap).count() == n_final

    # exact-dedup method: removes exactly the planted copies (one per
    # doc), nothing else; minhash can only remove MORE (it additionally
    # merges near-but-not-identical docs at jaccard >= 0.7)
    out2 = str(tmp_path / "curated_exact")
    curation_main(
        ["--config", cfg_path, "--input", inp, "--output", out2,
         "--method", "exact"]
    )
    n_exact = spark.read.parquet(f"{out2}/corpus").count()
    assert n_exact == 60
    assert n_final <= n_exact


def test_run_curation_cosine_method(spark, tmp_path):
    """--method cosine: embedding near-dups (LSH-bucketed cosine pairs ->
    components) sink every planted identical-vector copy; the embeddings
    table is semi-joined to the quality survivors first so a
    filtered-out doc can never be a component minimum."""
    from pacasam_spark.run_curation import main as curation_main

    base = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    corpus = base.unionByName(
        base.select((F.col("doc_id") + 5000).alias("doc_id"), "text")
    )
    inp = str(tmp_path / "docs.parquet")
    corpus.write.parquet(inp)
    # deterministic 8-dim embedding per BASE id: planted copies (d and
    # d+5000) share the exact vector -> cosine 1.0 pairs
    emb = corpus.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda j: F.cos((F.col("doc_id") % 5000).cast("double") * j.cast("double")).cast("float"),
        ).alias("embedding"),
    )
    emb_path = str(tmp_path / "emb.parquet")
    emb.write.parquet(emb_path)

    cfg_path = str(tmp_path / "cosine.yml")
    with open(cfg_path, "w") as fh:
        fh.write(
            "quality:\n"
            "  min_words: 3\n"
            "  min_stopword_hits: 0\n"
            "dedup:\n"
            "  method: cosine\n"
            "  threshold: 0.95\n"
            "  dim: 8\n"
        )

    out = str(tmp_path / "curated_cos")
    curation_main(
        ["--config", cfg_path, "--input", inp, "--output", out,
         "--embeddings", emb_path]
    )
    curated = spark.read.parquet(f"{out}/corpus")
    assert curated.filter(F.col("doc_id") >= 5000).count() == 0
    assert 0 < curated.count() <= 60


def test_run_curation_incremental_over_snapshot_table(spark, tmp_path):
    """The ingest->curate increment loop: batch B lands as an append on
    the input snapshot table; run_curation --since-version curates ONLY
    batch B (O(new docs)) and appends its survivors onto the curated
    corpus table, whose latest version is the cumulative corpus."""
    from pacasam_spark.run_curation import build_parser, run
    from pacasam_spark.sources.snapshots import (
        read_snapshot,
        snapshots,
        write_snapshot,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 80)
        .select("doc_id", "text")
        .cache()
    )
    batch_a = docs.filter(F.col("doc_id") < 40)
    # batch B: 40 docs planted twice -> exact dedup halves it
    batch_b0 = docs.filter(F.col("doc_id") >= 40)
    batch_b = batch_b0.unionByName(
        batch_b0.select((F.col("doc_id") + 5000).alias("doc_id"), "text")
    )
    intbl = str(tmp_path / "docs_tbl")
    outtbl = str(tmp_path / "corpus_tbl")
    write_snapshot(batch_a, intbl)

    # full run over v1
    common = ["--output", str(tmp_path / "o1"), "--input-table", intbl,
              "--snapshot-dir", outtbl, "--method", "exact", "--no-quality"]
    s1 = run(build_parser().parse_args(common))
    assert (s1["n_input"], s1["input_to_version"]) == (40, 1)
    assert snapshots(outtbl)[-1]["commit_type"] == "overwrite"

    # batch B arrives; incremental run curates only it
    write_snapshot(batch_b, intbl, mode="append")
    s2 = run(build_parser().parse_args(
        ["--output", str(tmp_path / "o2"), "--input-table", intbl,
         "--snapshot-dir", outtbl, "--method", "exact", "--no-quality",
         "--since-version", str(s1["input_to_version"])]
    ))
    assert s2["n_input"] == 80  # batch B only, not A again
    assert s2["n_final"] == 40  # exact dedup collapsed the plants
    assert s2["input_to_version"] == 2
    m = snapshots(outtbl)[-1]
    assert m["commit_type"] == "append"
    assert m["metadata"]["input_to_version"] == 2

    corpus = read_snapshot(spark, outtbl)
    got = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
    assert got == list(range(80))  # cumulative, min-id survivors only


def test_commit_catalogue_cli(spark, tmp_path, capsys):
    """tools/commit_catalogue.py: one ingest commit producing the
    combined layout — bucketed files + manifest stats + key counts —
    then run_sampling --catalogue-table consumes it with zero stats
    scans and a zero-exchange bucketed scan."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "commit_catalogue", "/root/repo/tools/commit_catalogue.py"
    )
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)

    from pacasam_spark.sources.synthetic import synthetic_catalogue

    src = str(tmp_path / "src.parquet")
    synthetic_catalogue(spark, db_size=800).write.parquet(src)
    tbl = str(tmp_path / "table")
    cc.main([
        "--input", src, "--table", tbl,
        "--bucket-key", "file_id", "--buckets", "4",
        "--norm-columns", "nb_sol,nb_bati", "--count-key", "file_id",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 800 and out["version"] == 1
    assert out["layout"]["n_buckets"] == 4
    assert out["manifest_stats"] and out["key_counts"] == "file_id"

    from pacasam_spark.sources.snapshots import read_snapshot

    tdf = read_snapshot(spark, tbl)
    assert tdf.count() == 800
    grouped = tdf.groupBy("file_id").count()
    plan = grouped._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan

    # gpkg input path: round-trip through the GeoPackage writer
    from pacasam_spark.sources.geopkg import write_gpkg

    g = str(tmp_path / "cat.gpkg")
    write_gpkg(
        synthetic_catalogue(spark, db_size=100), g, table="catalogue"
    )
    tbl2 = str(tmp_path / "table2")
    cc.main(["--input", g, "--table", tbl2])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["rows"] == 100 and out2["layout"] is None
