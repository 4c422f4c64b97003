"""Spatial layer tests: cell hierarchy, zone joins, kNN correctness."""

from pyspark.sql import functions as F

from pacasam_spark.spatial.cells import (
    cell_id,
    in_box,
    join_points_to_zones,
    with_cell_ids,
    zone_cells,
)
from pacasam_spark.spatial.knn import knn_join


def _points(spark, n=1000):
    from pacasam_spark.sources.synthetic import synthetic_catalogue

    return synthetic_catalogue(spark, db_size=n, exact_counts=False).select(
        "patch_id",
        ((F.col("geom_xmin") + F.col("geom_xmax")) / 2).alias("cx"),
        ((F.col("geom_ymin") + F.col("geom_ymax")) / 2).alias("cy"),
    )


def test_cell_hierarchy_nesting(spark):
    pts = with_cell_ids(_points(spark), "cx", "cy", levels=[0, 1, 2])
    # every level-0 cell maps to exactly one parent at each higher level
    for child, parent in (("cell_l0", "cell_l1"), ("cell_l1", "cell_l2")):
        m = pts.groupBy(child).agg(F.countDistinct(parent).alias("n")).collect()
        assert all(r["n"] == 1 for r in m)


def test_zone_join_matches_plain_predicate(spark):
    pts = _points(spark, 2000)
    zones = [("a", 0.0, 0.0, 777.0, 777.0), ("b", 500.0, 500.0, 1800.0, 1300.0)]
    zdf = zone_cells(spark, zones, level=0)
    fast = {
        (r["patch_id"], r["zone_id"])
        for r in join_points_to_zones(pts, zdf, "cx", "cy", level=0).collect()
    }
    slow = set()
    for zid, xmin, ymin, xmax, ymax in zones:
        for r in pts.filter(
            in_box(F.col("cx"), F.col("cy"), xmin, ymin, xmax, ymax)
        ).collect():
            slow.add((r["patch_id"], zid))
    assert fast == slow and len(fast) > 0


def test_knn_bucketed_equals_bruteforce(spark):
    pts = _points(spark, 1600).cache()  # 40x40 grid of 50m -> 4 cells of 1km
    queries = pts.filter(F.pmod("patch_id", F.lit(80)) == 0).select(
        F.col("patch_id").alias("q_id"),
        F.col("cx").alias("qx"),
        F.col("cy").alias("qy"),
    )
    fast = {
        (r["q_id"], r["rank"]): r["neighbor_id"]
        for r in knn_join(pts, queries, k=5, level=0).collect()
    }
    # brute force via cross join (small)
    from pyspark.sql import Window

    j = pts.crossJoin(queries)
    ddx, ddy = F.col("cx") - F.col("qx"), F.col("cy") - F.col("qy")
    w = Window.partitionBy("q_id").orderBy(
        (ddx * ddx + ddy * ddy).asc(), F.col("patch_id")
    )
    brute = {
        (r["q_id"], r["rank"]): r["patch_id"]
        for r in j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .collect()
    }
    assert fast == brute
    assert len(fast) == 5 * queries.count()
