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


def _pip_py(px, py, verts):
    inside = False
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        if (y1 > py) != (y2 > py) and px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


def test_point_in_polygon_matches_reference_raycast(spark):
    """Fold-expression ray cast == an independent pure-Python ray cast on
    a non-convex polygon, for a grid of probe points."""
    from pacasam_spark.spatial.polygons import join_points_to_polygons

    lshape = [(0.0, 0.0), (40.0, 0.0), (40.0, 20.0), (20.0, 20.0),
              (20.0, 40.0), (0.0, 40.0)]
    pts = [(i, 1.0 + 3.7 * (i % 13), 1.0 + 2.9 * (i // 13)) for i in range(150)]
    df = spark.createDataFrame(pts, "pid int, px double, py double")
    got = {
        r["pid"]
        for r in join_points_to_polygons(
            df, [("z", lshape)], "px", "py", level=0, base=8.0
        ).collect()
    }
    want = {pid for pid, px, py in pts if _pip_py(px, py, lshape)}
    assert got == want
    assert 0 < len(want) < len(pts)  # the probe grid straddles the boundary


def test_polygon_join_is_cell_pruned_broadcast(spark):
    """Plan shape: broadcast hash join on the cell id, no cartesian."""
    from pacasam_spark.spatial.polygons import join_points_to_polygons

    df = spark.range(1000).selectExpr(
        "id as pid", "cast(id % 50 as double) * 10 as px",
        "cast(id / 50 as double) * 10 as py"
    )
    out = join_points_to_polygons(
        df, [("z", [(0.0, 0.0), (100.0, 0.0), (50.0, 80.0)])], "px", "py", level=0,
        base=100.0,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan


def test_polygon_cell_classification_exact_and_pruning(spark):
    """Interior/boundary/outside cell classification: results stay
    bit-identical to the per-point ray cast, while (a) uniform-outside
    cells of the bbox never join and (b) interior cells skip the ray
    cast (empty edge list)."""
    from pacasam_spark.spatial.polygons import (
        join_points_to_polygons,
        polygon_zone_cells,
    )

    # big L-shape over a fine grid: bbox 40x40 at base 4 -> 100 bbox
    # cells, of which ~25 are outside the L and ~dozens interior
    lshape = [(0.0, 0.0), (40.0, 0.0), (40.0, 20.0), (20.0, 20.0),
              (20.0, 40.0), (0.0, 40.0)]
    cells = polygon_zone_cells(spark, [("z", lshape)], level=0, base=4.0)
    rows = cells.collect()
    n_interior = sum(1 for r in rows if r["interior"])
    assert n_interior > 0
    assert all(len(r["edges"]) == 0 for r in rows if r["interior"])
    assert len(rows) < 100  # uniform-outside bbox cells dropped
    assert n_interior < len(rows)  # boundary cells remain exact

    pts = [(i, 0.3 + 1.9 * (i % 23), 0.3 + 1.7 * (i // 23)) for i in range(500)]
    df = spark.createDataFrame(pts, "pid int, px double, py double")
    got = {
        r["pid"]
        for r in join_points_to_polygons(
            df, [("z", lshape)], "px", "py", level=0, base=4.0
        ).collect()
    }
    want = {pid for pid, px, py in pts if _pip_py(px, py, lshape)}
    assert got == want


def test_polygon_edge_pruning_exact_on_many_edge_zones(spark):
    """Per-cell edge pruning (drop edges left of the cell or outside its
    y-band) is result-preserving on a 64-edge wobbly ring — every match
    equals the full-edge-list pure-Python ray cast — while boundary
    cells carry a strict subset of the polygon's edges."""
    import math

    from pyspark.sql import functions as F

    from pacasam_spark.spatial.polygons import (
        join_points_to_polygons,
        polygon_zone_cells,
    )

    ring = [
        (
            50.0 + 35.0 * (1 + 0.2 * math.sin(5 * t)) * math.cos(t),
            50.0 + 35.0 * (1 + 0.2 * math.sin(5 * t)) * math.sin(t),
        )
        for t in (2 * math.pi * i / 64 for i in range(64))
    ]
    cells = polygon_zone_cells(spark, [("z", ring)], level=0, base=10.0)
    boundary = [r for r in cells.collect() if not r["interior"]]
    assert boundary
    # pruning bites: no boundary cell carries the full 64-edge list
    assert max(len(r["edges"]) for r in boundary) < 64

    pts = [(i, 0.7 + 2.3 * (i % 43), 0.7 + 2.1 * (i // 43)) for i in range(1800)]
    df = spark.createDataFrame(pts, "pid int, px double, py double")
    got = {
        r["pid"]
        for r in join_points_to_polygons(
            df, [("z", ring)], "px", "py", level=0, base=10.0
        ).collect()
    }
    want = {pid for pid, px, py in pts if _pip_py(px, py, ring)}
    assert got == want
    assert 0 < len(want) < len(pts)


def test_distributed_zone_cells_equal_driver_builder(spark):
    """polygon_zone_cells_distributed (pure expressions, no driver loop)
    emits EXACTLY the driver builder's rows — same cells, same interior
    flags, same pruned edge lists — on both a non-convex L and a
    64-edge wobbly ring."""
    import math

    from pacasam_spark.spatial.polygons import (
        polygon_edges,
        polygon_zone_cells,
        polygon_zone_cells_distributed,
    )

    lshape = [(0.0, 0.0), (40.0, 0.0), (40.0, 20.0), (20.0, 20.0),
              (20.0, 40.0), (0.0, 40.0)]
    ring = [
        (
            50.0 + 35.0 * (1 + 0.2 * math.sin(5 * t)) * math.cos(t),
            50.0 + 35.0 * (1 + 0.2 * math.sin(5 * t)) * math.sin(t),
        )
        for t in (2 * math.pi * i / 64 for i in range(64))
    ]
    zones = [("L", lshape), ("ring", ring)]
    zdf = spark.createDataFrame(
        [(zid, polygon_edges(v)) for zid, v in zones],
        "zone_id string, edges array<array<double>>",
    )

    def canon(df):
        return sorted(
            (r["zone_id"], r["cell"], r["interior"],
             tuple(tuple(e) for e in r["edges"]))
            for r in df.collect()
        )

    for level, base in [(0, 4.0), (0, 10.0), (1, 8.0)]:
        want = canon(polygon_zone_cells(spark, zones, level, base))
        got = canon(polygon_zone_cells_distributed(zdf, level, base))
        assert got == want, (level, base)
        assert want  # non-degenerate

    # pure column pipeline: no Python workers in the plan
    plan = (
        polygon_zone_cells_distributed(zdf, 0, 10.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_polygon_join_shuffle_mode_equals_broadcast(spark):
    """broadcast_zones=False + a zones DataFrame: the join becomes a
    shuffle equi-join on the cell id (the arbitrarily-many-zones path) —
    same matches as the broadcast path, no broadcast, no cartesian."""
    from pacasam_spark.spatial.polygons import (
        join_points_to_polygons,
        polygon_edges,
    )

    lshape = [(0.0, 0.0), (40.0, 0.0), (40.0, 20.0), (20.0, 20.0),
              (20.0, 40.0), (0.0, 40.0)]
    pts = [(i, 0.3 + 1.9 * (i % 23), 0.3 + 1.7 * (i // 23)) for i in range(500)]
    df = spark.createDataFrame(pts, "pid int, px double, py double")
    zdf = spark.createDataFrame(
        [("z", polygon_edges(lshape))],
        "zone_id string, edges array<array<double>>",
    )
    out = join_points_to_polygons(
        df, zdf, "px", "py", level=0, base=4.0, broadcast_zones=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan and "Cartesian" not in plan
    got = {r["pid"] for r in out.collect()}
    want = {
        r["pid"]
        for r in join_points_to_polygons(
            df, [("z", lshape)], "px", "py", level=0, base=4.0
        ).collect()
    }
    assert got == want and got == {
        pid for pid, px, py in pts if _pip_py(px, py, lshape)
    }
