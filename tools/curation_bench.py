"""Incremental-curation evidence: the flagship corpus workflow
(gopher funnel -> minhash near-dedup -> corpus snapshot + signature
index) costs O(corpus) on the first run and O(increment) after — the
cross-batch signature index (operators/sigindex.py) joins a new batch
against everything the corpus has already seen instead of re-curating.

Prints ONE JSON line:
{"n_corpus_docs": N, "n_increment": n, "full_sec": ..,
 "incremental_sec": .., "speedup": .., "n_cross_dropped": ..,
 "replay_sec": .., "replay_is_noop": true}

Usage: python tools/curation_bench.py [n_docs] [n_increment]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def synthetic_docs(spark, lo: int, hi: int, words: int = 60):
    """Deterministic hash-derived documents (doc_id, text) — pure column
    expressions, ~6 chars/word from a 4096-word implied vocabulary."""
    word = lambda j: F.concat(  # noqa: E731
        F.lit("w"),
        F.conv(
            (F.pmod(F.xxhash64(F.col("doc_id") * 64 + j), F.lit(4096))).cast(
                "string"
            ),
            10,
            36,
        ),
    )
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[word(F.lit(j)) for j in range(words)]).alias("text"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_inc = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    n_dup = max(1, n_inc // 4)

    from pacasam_spark.run_curation import build_parser, run
    from pacasam_spark.session import get_spark
    from pacasam_spark.sources.snapshots import read_snapshot, write_snapshot

    spark = get_spark(app_name="curation_bench", cores=32)
    base = tempfile.mkdtemp(prefix="curation_bench_")
    intbl = os.path.join(base, "docs")
    corpus = os.path.join(base, "corpus")
    cfg = os.path.join(base, "cur.yml")
    with open(cfg, "w") as fh:
        fh.write("dedup:\n  method: minhash\n  jaccard_threshold: 0.7\n")

    try:
        write_snapshot(synthetic_docs(spark, 0, n_docs), intbl)
        argv = ["--config", cfg, "--input-table", intbl,
                "--snapshot-dir", corpus, "--no-quality"]

        t0 = time.perf_counter()
        s1 = run(build_parser().parse_args(argv + ["--output", f"{base}/o1"]))
        full_sec = time.perf_counter() - t0

        # increment: fresh docs + exact copies of curated survivors
        survivors = read_snapshot(spark, corpus).select("doc_id").limit(n_dup)
        inc = synthetic_docs(spark, n_docs, n_docs + n_inc - n_dup).unionByName(
            read_snapshot(spark, corpus)
            .join(survivors, "doc_id", "left_semi")
            .select((F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text")
        )
        write_snapshot(inc, intbl, mode="append")

        t0 = time.perf_counter()
        s2 = run(build_parser().parse_args(
            argv + ["--output", f"{base}/o2", "--since-version",
                    str(s1["input_to_version"])]
        ))
        incr_sec = time.perf_counter() - t0

        # replay the same increment: every doc is indexed -> no-op
        t0 = time.perf_counter()
        s3 = run(build_parser().parse_args(
            argv + ["--output", f"{base}/o3", "--since-version",
                    str(s1["input_to_version"])]
        ))
        replay_sec = time.perf_counter() - t0

        print(json.dumps({
            "n_corpus_docs": n_docs,
            "n_increment": n_inc,
            "full_sec": round(full_sec, 2),
            "incremental_sec": round(incr_sec, 2),
            "speedup": round(full_sec / incr_sec, 1),
            "n_cross_dropped": s2["n_cross_batch_dropped"],
            "n_new_in_corpus": s2["n_final"],
            "replay_sec": round(replay_sec, 2),
            "replay_is_noop": s3["n_final"] == 0,
        }))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
