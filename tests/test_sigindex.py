"""Cross-batch signature index (round-6 verdict #1): incremental
curation must drop a new document that duplicates one the corpus has
already considered, and replaying a batch must be a no-op.

Strategy: the cross-batch join is EQUIVALENT to the within-batch
self-join restricted to (old, new) pairs — so the unit tests assert
exact set equality between ``cross_batch_duplicate_ids`` and the
existing (oracle-gated) pair generators run over old ∪ new, with caps
disabled. The e2e test drives run_curation through the full
append -> incremental -> replay loop (the verdict's done-criterion).
"""

import pytest
from pyspark.sql import functions as F

from pacasam_spark.operators.sigindex import (
    cross_batch_duplicate_ids,
    ensure_sig_index,
    sig_index_dir,
    signature_table,
)


def _docs(spark, lo, hi):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .select("doc_id", "text")
    )


def _with_plants(old, new):
    """new ∪ exact copies of some old docs (id+9000) ∪ appended-word
    near-copies of others (id+8000) — cross-batch duplicate structure
    without hand-tuned hash collisions."""
    exact = old.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 9000).alias("doc_id"), "text"
    )
    near = old.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)).select(
        (F.col("doc_id") + 8000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" appended trailer words here")).alias("text"),
    )
    return new.unionByName(exact).unionByName(near)


def test_cross_batch_equivalence_minhash(spark):
    """cross ids == new-side ids of the within-batch LSH pair table
    (jaccard-verified) restricted to cross pairs — same bands, same
    signatures, same verification, so the sets must match exactly."""
    from pacasam_spark.operators.dedup import lsh_near_dup_pairs, ngram_jaccard_pairs

    old = _docs(spark, 0, 50).cache()
    new = _with_plants(old, _docs(spark, 50, 80)).cache()
    dcf = {"jaccard_threshold": 0.7, "min_shared_bands": 2}

    index = signature_table(old, "minhash")
    got = {
        r["doc_id"]
        for r in cross_batch_duplicate_ids(
            new, index, "minhash", corpus=old, dcf=dcf
        ).collect()
    }

    both = old.unionByName(new)
    pairs = lsh_near_dup_pairs(both, min_shared_bands=2)
    jac = ngram_jaccard_pairs(both, threshold=0.7)
    verified = pairs.join(jac.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi")
    old_ids = {r["doc_id"] for r in old.select("doc_id").collect()}
    expected = set()
    for r in verified.collect():
        if (r["id_a"] in old_ids) != (r["id_b"] in old_ids):
            expected.add(r["id_b"] if r["id_a"] in old_ids else r["id_a"])
    assert got == expected
    # the plants guarantee the test is not vacuous: every exact copy is
    # a certain catch (jaccard 1.0, all bands shared)
    assert {9000 + i for i in range(10)} <= got


def test_cross_batch_equivalence_simhash_and_phash(spark):
    from pacasam_spark.operators.dedup import (
        hamming_near_dup_pairs,
        simhash_band_pairs,
    )

    old = _docs(spark, 0, 50).cache()
    new = _with_plants(old, _docs(spark, 50, 80)).cache()
    old_ids = {r["doc_id"] for r in old.select("doc_id").collect()}

    def cross_of(pairs):
        out = set()
        for r in pairs.collect():
            if (r["id_a"] in old_ids) != (r["id_b"] in old_ids):
                out.add(r["id_b"] if r["id_a"] in old_ids else r["id_a"])
        return out

    # simhash, Hamming <= 3
    idx = signature_table(old, "simhash")
    got = {
        r["doc_id"]
        for r in cross_batch_duplicate_ids(
            new, idx, "simhash", dcf={"max_distance": 3}
        ).collect()
    }
    both = old.unionByName(new)
    assert got == cross_of(simhash_band_pairs(both, max_distance=3))
    assert {9000 + i for i in range(10)} <= got  # exact copies: distance 0

    # phash, Hamming <= 7 over synthetic int64 fingerprints: old hashes
    # h(i); new side plants h(i) with <=7 bits flipped (id+9000) plus
    # far-away hashes
    oldh = spark.range(40).select(
        F.col("id").alias("doc_id"), F.xxhash64("id").alias("phash")
    )
    newh = spark.range(40, 70).select(
        F.col("id").alias("doc_id"), F.xxhash64("id").alias("phash")
    ).unionByName(
        spark.range(10).select(
            (F.col("id") + 9000).alias("doc_id"),
            # flip bits {3, 17, 41} of the old hash: distance 3
            F.xxhash64("id").bitwiseXOR(F.lit((1 << 3) | (1 << 17) | (1 << 41))).alias("phash"),
        )
    )
    idxh = signature_table(oldh, "phash", id_col="doc_id")
    goth = {
        r["doc_id"]
        for r in cross_batch_duplicate_ids(
            newh, idxh, "phash", id_col="doc_id", dcf={"max_distance": 7}
        ).collect()
    }
    allh = oldh.unionByName(newh)
    old_ids = set(range(40))
    exp = set()
    for r in hamming_near_dup_pairs(allh, id_col="doc_id", max_distance=7).collect():
        if (r["id_a"] in old_ids) != (r["id_b"] in old_ids):
            exp.add(r["id_b"] if r["id_a"] in old_ids else r["id_a"])
    assert goth == exp
    assert {9000 + i for i in range(10)} <= goth


def test_cross_batch_cosine_scaled_copies(spark):
    """Scaled copies (2x the vector) have identical hyperplane signs in
    every LSH table — a deterministic collision — and cosine exactly
    1.0; fresh vectors stay below the 0.999 threshold."""
    # hash-derived pseudo-random components: cos(id*j) vectors alias
    # (44 ≈ 14π makes vector 44 a near-copy of vector 0)
    def rand_vec():
        return F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda j: (
                (F.xxhash64(F.col("id") * 8 + j) % 1000) / 500.0 - 1.0
            ).cast("float"),
        ).alias("embedding")

    old = spark.range(40).select(F.col("id").alias("doc_id"), rand_vec())
    plants = old.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 9000).alias("doc_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0).cast("float")).alias(
            "embedding"
        ),
    )
    fresh = spark.range(40, 60).select(F.col("id").alias("doc_id"), rand_vec())
    new_emb = plants.unionByName(fresh)
    new_docs = new_emb.select("doc_id")

    idx = signature_table(
        old.select("doc_id"), "cosine", id_col="doc_id",
        params={"dim": 8, "vec_col": "embedding"}, emb=old,
    )
    got = {
        r["doc_id"]
        for r in cross_batch_duplicate_ids(
            new_docs, idx, "cosine", id_col="doc_id",
            dcf={"threshold": 0.999, "dim": 8}, emb=new_emb,
        ).collect()
    }
    assert got == {9000 + i for i in range(10)}


def _write_cfg(path, extra=""):
    with open(path, "w") as fh:
        fh.write(
            "dedup:\n"
            "  method: minhash\n"
            "  jaccard_threshold: 0.7\n" + extra
        )


def test_incremental_cross_batch_dedup_e2e(spark, tmp_path):
    """The verdict's done-criterion: curate batch A; append batch B
    containing duplicates of A's survivors; the corpus holds exactly one
    copy; the index commits with the corpus version; replaying batch B
    is a no-op — including for docs whose within-batch dedup winner is
    itself absent from the corpus."""
    from pacasam_spark.run_curation import build_parser, run
    from pacasam_spark.sources.snapshots import (
        read_snapshot,
        snapshots,
        write_snapshot,
    )

    batch_a = _docs(spark, 0, 40)
    # batch B: 20 fresh docs, exact copies of 10 A docs (id+9000), and a
    # within-B exact pair (doc 50's text under ids 7001 < 7002, both new)
    dup_pair = _docs(spark, 50, 51)
    batch_b = (
        _docs(spark, 40, 60)
        .unionByName(
            batch_a.filter(F.col("doc_id") < 10).select(
                (F.col("doc_id") + 9000).alias("doc_id"), "text"
            )
        )
        .unionByName(dup_pair.select(F.lit(7001).alias("doc_id"), "text"))
        .unionByName(dup_pair.select(F.lit(7002).alias("doc_id"), "text"))
    )
    intbl = str(tmp_path / "docs_tbl")
    outtbl = str(tmp_path / "corpus_tbl")
    write_snapshot(batch_a, intbl)

    cfg = str(tmp_path / "cur.yml")
    _write_cfg(cfg)
    base = ["--config", cfg, "--input-table", intbl,
            "--snapshot-dir", outtbl, "--no-quality"]
    s1 = run(build_parser().parse_args(base + ["--output", str(tmp_path / "o1")]))
    n_a = s1["n_final"]
    assert s1["sig_index_version"] == 1
    idx_meta = snapshots(sig_index_dir(outtbl))[-1]["metadata"]
    assert idx_meta["corpus_version"] == s1["snapshot_version"]
    assert idx_meta["method"] == "minhash"

    write_snapshot(batch_b, intbl, mode="append")
    s2 = run(build_parser().parse_args(
        base + ["--output", str(tmp_path / "o2"), "--since-version", "1"]
    ))
    # the 10 exact copies of A survivors were dropped CROSS-batch (the
    # testdata also contains natural near-dups across the A/B split, so
    # >= 10, not ==); 7002 loses its component either way — to 50
    # within the batch or, if 50 itself cross-matched an A doc, to 7001
    assert s2["n_cross_batch_dropped"] >= 10
    corpus = read_snapshot(spark, outtbl)
    assert corpus.count() == n_a + s2["n_final"]
    assert corpus.filter(F.col("doc_id") >= 9000).count() == 0
    assert corpus.filter(F.col("doc_id") == 7002).count() == 0
    # the corpus-level invariant: no exact duplicate text survives
    assert (
        corpus.groupBy(F.md5("text")).count().filter("count > 1").count() == 0
    )

    # REPLAY batch B (same --since-version): every quality survivor of B
    # is now indexed — winners AND losers — so the whole batch drops and
    # the corpus is unchanged
    n_before = corpus.count()
    s3 = run(build_parser().parse_args(
        base + ["--output", str(tmp_path / "o3"), "--since-version", "1"]
    ))
    # every B doc — corpus winners AND within-batch losers like 7002 —
    # matches its own indexed signatures: the whole batch drops
    assert s3["n_cross_batch_dropped"] == s3["n_quality_survivors"] == 32
    assert s3["n_final"] == 0
    assert read_snapshot(spark, outtbl).count() == n_before


def test_sig_index_heal_after_crash(spark, tmp_path):
    """A crash between the corpus commit and the index commit leaves the
    index one corpus version behind; ensure_sig_index tops it up from
    the snapshot_changes increment, after which duplicates of the
    unindexed docs are still caught."""
    from pacasam_spark.sources.snapshots import snapshots, write_snapshot

    outtbl = str(tmp_path / "corpus_tbl")
    a = _docs(spark, 0, 30)
    write_snapshot(a, outtbl)
    dcf = {"jaccard_threshold": 0.7}
    idx = ensure_sig_index(spark, outtbl, "minhash", dcf)  # bootstrap
    assert idx is not None
    assert snapshots(sig_index_dir(outtbl))[-1]["metadata"]["corpus_version"] == 1

    # corpus gains v2 with no index commit (the crash)
    late = _docs(spark, 30, 40)
    write_snapshot(late, outtbl, mode="append")
    idx2 = ensure_sig_index(spark, outtbl, "minhash", dcf)
    meta = snapshots(sig_index_dir(outtbl))[-1]["metadata"]
    assert meta["corpus_version"] == 2
    # healed index catches a duplicate of a v2-only doc
    new = late.filter(F.col("doc_id") == 35).select(
        F.lit(9999).alias("doc_id"), "text"
    )
    got = cross_batch_duplicate_ids(
        new, idx2, "minhash",
        corpus=a.unionByName(late), dcf=dcf,
    ).collect()
    assert [r["doc_id"] for r in got] == [9999]


def test_sig_index_param_mismatch_raises(spark, tmp_path):
    from pacasam_spark.sources.snapshots import write_snapshot

    outtbl = str(tmp_path / "corpus_tbl")
    write_snapshot(_docs(spark, 0, 10), outtbl)
    ensure_sig_index(spark, outtbl, "minhash", {"bands": 4})
    with pytest.raises(ValueError, match="not comparable"):
        ensure_sig_index(spark, outtbl, "minhash", {"bands": 8})
    with pytest.raises(ValueError, match="not comparable"):
        ensure_sig_index(spark, outtbl, "simhash", {})


def test_cross_batch_indexed_loser_chain_replay(spark):
    """A-B-C near-dup chains (round-7 advice): B was dropped as a dup of
    corpus doc A, so B's text is NOT in the corpus but B's signatures ARE
    in the index. A later batch carrying C == B must still be dropped:
    C full-band-matches B's indexed signatures and the short-circuit
    (exact signature match => duplicate, no corpus text needed) fires
    before the corpus-side Jaccard joins could silently lose the pair."""
    corpus = _docs(spark, 0, 30).cache()
    # B: indexed dedup losers whose text never reached the corpus
    losers = _docs(spark, 0, 10).select(
        (F.col("doc_id") + 7000).alias("doc_id"), "text"
    )
    index = signature_table(corpus.unionByName(losers), "minhash")
    # C: exact replays of the losers under fresh ids
    replay = losers.select((F.col("doc_id") + 500).alias("doc_id"), "text")
    got = {
        r["doc_id"]
        for r in cross_batch_duplicate_ids(
            replay,
            index,
            "minhash",
            corpus=corpus,
            dcf={"jaccard_threshold": 0.7, "min_shared_bands": 2},
        ).collect()
    }
    want = {r["doc_id"] for r in replay.select("doc_id").collect()}
    assert got == want, f"missing replayed dups: {sorted(want - got)}"
