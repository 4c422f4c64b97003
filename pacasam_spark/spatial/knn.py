"""Cell-bucketed k-nearest-neighbour join over patch centroids
(north rule: "H3/S2 index, point-in-polygon, kNN").

For each query point, candidates are the points in the query's cell and
its 8 neighbours (one equi-join on cell id — never a cross product),
then an exact squared-distance window rank keeps the k nearest.

Guarantee: exact kNN whenever the true k-th neighbour lies within one
cell edge; pick ``level`` so the expected k-th-NN radius < edge (for
uniform density d pts/cell, k <= d suffices). The same construction is
SQL-expressible, so the DuckDB oracle replays it exactly; a pytest
verifies bucketed == brute-force on dense data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pacasam_spark.spatial.cells import cell_edge

NEIGHBOR_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _with_cell_xy(df: DataFrame, x: str, y: str, level: int, base: float):
    edge = cell_edge(level, base)
    return df.withColumn("__cx", F.floor(F.col(x) / edge).cast("long")).withColumn(
        "__cy", F.floor(F.col(y) / edge).cast("long")
    )


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    level: int = 0,
    base: float = 1000.0,
    id_col: str = "patch_id",
    q_id_col: str = "q_id",
    x: str = "cx",
    y: str = "cy",
    qx: str = "qx",
    qy: str = "qy",
) -> DataFrame:
    """Exact-within-radius kNN: (q_id, neighbor_id, dist2, rank).

    Shuffle profile: queries explode x9 (tiny), one hash join on the cell
    key, one window partitioned by query id. Self-points (same id) are
    not excluded — filter upstream if needed.
    """
    pts = _with_cell_xy(points, x, y, level, base).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(x).alias("__px"),
        F.col(y).alias("__py"),
        F.concat_ws("_", "__cx", "__cy").alias("__cell"),
    )
    offsets = F.array(
        *[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in NEIGHBOR_OFFSETS]
    )
    qs = (
        _with_cell_xy(queries, qx, qy, level, base)
        .withColumn("__o", F.explode(offsets))
        .select(
            F.col(q_id_col).alias("q_id"),
            F.col(qx).alias("__qx"),
            F.col(qy).alias("__qy"),
            F.concat_ws(
                "_", F.col("__cx") + F.col("__o.dx"), F.col("__cy") + F.col("__o.dy")
            ).alias("__cell"),
        )
    )
    joined = pts.join(qs, "__cell")
    ddx = F.col("__px") - F.col("__qx")
    ddy = F.col("__py") - F.col("__qy")
    d2 = ddx * ddx + ddy * ddy  # explicit mults: pow(x,2) may differ in ulps
    w = Window.partitionBy("q_id").orderBy(d2.asc(), F.col("neighbor_id"))
    return (
        joined.withColumn("dist2", d2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "dist2", "rank")
    )


def knn_join_sql(
    points_sql: str,
    queries_sql: str,
    k: int,
    level: int = 0,
    base: float = 1000.0,
) -> str:
    """DuckDB twin of :func:`knn_join` (points_sql: id/cx/cy;
    queries_sql: q_id/qx/qy)."""
    edge = cell_edge(level, base)
    return f"""
with pts as (
  select patch_id as neighbor_id, cx as px, cy as py,
         concat(cast(cast(floor(cx / {edge}) as bigint) as varchar), '_',
                cast(cast(floor(cy / {edge}) as bigint) as varchar)) as cell
  from ({points_sql})
),
qs as (
  select q_id, qx, qy,
         concat(cast(cast(floor(qx / {edge}) as bigint) + o.dx as varchar), '_',
                cast(cast(floor(qy / {edge}) as bigint) + o.dy as varchar)) as cell
  from ({queries_sql}),
       (select a.range - 1 as dx, b.range - 1 as dy
        from range(3) a, range(3) b) o
),
joined as (
  select q_id, neighbor_id,
         (px - qx) * (px - qx) + (py - qy) * (py - qy) as dist2
  from pts join qs using (cell)
),
ranked as (
  select *, row_number() over (partition by q_id
                               order by dist2 asc, neighbor_id) as rank
  from joined
)
select q_id, neighbor_id, dist2, rank from ranked where rank <= {k}
"""
