"""Hierarchical cell index + spatial predicates (SURVEY.md §4.3-8).

The reference's only spatial index is the slab id
``"{x//1000}_{y//1000}"`` (reference: connectors/synthetic.py:112). This
module generalizes it into an H3/S2-like hierarchy of square cells with
aperture 4 (each parent covers 2x2 children), all computed as pure column
expressions — no UDF, fully codegen'd, and usable as partitioning /
stratification / join keys.

Zone filtering (point-in-box) is a plain range predicate — the reference
only supports axis-aligned boxes (README.md:198) — pushed down by
Catalyst. For polygon zones at target scale the design is: coarse cell
pre-filter (equi-join on cell id against the broadcast zone->cells table)
followed by an exact vectorized test per candidate — see
``zone_cells``/``join_points_to_zones``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BASE_CELL_M = 1000  # level-0 cell edge; level k edge = BASE * 2^k


def cell_edge(level: int, base: float = BASE_CELL_M) -> float:
    return base * (2**level)


def cell_id(x: Column, y: Column, level: int, base: float = BASE_CELL_M) -> Column:
    """Cell id string "cx_cy" at the given level (X7 generalized)."""
    edge = cell_edge(level, base)
    return F.concat(
        F.floor(x / edge).cast("long").cast("string"),
        F.lit("_"),
        F.floor(y / edge).cast("long").cast("string"),
    )


def cell_id_sql(x: str, y: str, level: int, base: float = BASE_CELL_M) -> str:
    edge = cell_edge(level, base)
    return (
        f"concat(cast(cast(floor(({x}) / {edge}) as bigint) as varchar), '_', "
        f"cast(cast(floor(({y}) / {edge}) as bigint) as varchar))"
    )


def with_cell_ids(
    df: DataFrame, x: str, y: str, levels: list[int], base: float = BASE_CELL_M
) -> DataFrame:
    for lv in levels:
        df = df.withColumn(f"cell_l{lv}", cell_id(F.col(x), F.col(y), lv, base))
    return df


def in_box(x: Column, y: Column, xmin: float, ymin: float, xmax: float, ymax: float) -> Column:
    """Point-in-axis-aligned-box predicate (F8) — pushed to the scan."""
    return (x >= xmin) & (x < xmax) & (y >= ymin) & (y < ymax)


def zone_cells(
    spark,
    zones: list[tuple[str, float, float, float, float]],
    level: int,
    base: float = BASE_CELL_M,
) -> DataFrame:
    """Expand each zone box (id, xmin, ymin, xmax, ymax) into the level-k
    cells it overlaps — the small broadcast side of a cell-coarse spatial
    join. At target scale this is the 'broadcast R-tree per cell' role of
    the north rule, with boxes (all the reference supports) the per-cell
    exact test is the in_box predicate."""
    edge = cell_edge(level, base)
    rows = []
    for zid, xmin, ymin, xmax, ymax in zones:
        cx0, cx1 = int(xmin // edge), int((xmax - 1e-9) // edge)
        cy0, cy1 = int(ymin // edge), int((ymax - 1e-9) // edge)
        for cx in range(cx0, cx1 + 1):
            for cy in range(cy0, cy1 + 1):
                rows.append((zid, f"{cx}_{cy}", xmin, ymin, xmax, ymax))
    return spark.createDataFrame(
        rows, "zone_id string, cell string, xmin double, ymin double, xmax double, ymax double"
    )


def join_points_to_zones(
    points: DataFrame,
    zones_df: DataFrame,
    x: str,
    y: str,
    level: int,
    base: float = BASE_CELL_M,
) -> DataFrame:
    """Cell-coarse equi-join (broadcast) + exact box test — the scalable
    point-in-zone join: no cartesian, the shuffle key is the cell id."""
    pts = points.withColumn("__cell", cell_id(F.col(x), F.col(y), level, base))
    joined = pts.join(F.broadcast(zones_df), pts["__cell"] == zones_df["cell"])
    exact = (
        (F.col(x) >= F.col("xmin"))
        & (F.col(x) < F.col("xmax"))
        & (F.col(y) >= F.col("ymin"))
        & (F.col(y) < F.col("ymax"))
    )
    return joined.filter(exact).drop("__cell", "cell", "xmin", "ymin", "xmax", "ymax")
