"""Z-order (Morton) clustering for spatial data skipping.

At 100 TB the scan you never run is the cheapest: Iceberg/Delta prune
whole files from a query by comparing the query's predicate ranges
against per-file column min/max stats, and the stats are only selective
if the layout co-locates spatially-near rows in the same files. This
module provides both halves of that, engine-level:

- :func:`morton_key` — interleave the bits of the two cell coordinates
  into one long, as a PURE column expression (five shift/mask rounds per
  coordinate, whole-stage codegen, no UDF). Rows close in (x, y) get
  close Morton keys, so range-partitioning on the key packs each output
  file into a compact spatial square (the Delta ``OPTIMIZE ZORDER BY``
  transform; Iceberg's equivalent is a sort order on a z-curve column).
- :func:`cluster_by_zorder` — repartitionByRange + sortWithinPartitions
  on that key: each written file covers a contiguous key range, so its
  x/y min/max (recorded by ``write_snapshot(stats_columns=...)``,
  sources/snapshots.py) form a tight bbox and a box query prunes most
  files before Spark even lists them.

A Hilbert curve would tighten per-file bboxes by a small constant (no
diagonal jumps); Morton is chosen because it is expressible in five
fixed shift/mask rounds of codegen per coordinate — the Hilbert rotation
recurrence needs a per-bit state machine (a loop-carried dependency that
only a UDF or a 2^bits lookup expresses), and the measured pruning win
at the file granularity is dominated by having ANY space-filling
clustering, not by which curve.

Reference: pacasam's catalogue is one flat GeoPackage with no layout
control (connectors/geopandas.py:24-31); its only spatial locality is
the incidental row order of the source database.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pacasam_spark.spatial.cells import BASE_CELL_M, cell_edge

# 31 bits per coordinate: the interleaved key fills 62 bits and stays a
# non-negative signed long, so plain long ordering IS z-curve ordering.
BITS = 31
BIAS = 1 << 30  # shifts floor-cell coords of either sign into [0, 2^31)

_SPREAD_ROUNDS = [  # classic parallel-prefix bit spread: x -> x0x1x2...
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread(v: Column) -> Column:
    """Spread the low 32 bits of ``v`` onto the even bit positions."""
    v = v.bitwiseAND(F.lit(0xFFFFFFFF))
    for shift, mask in _SPREAD_ROUNDS:
        v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(F.lit(mask))
    return v


def morton_key(cx: Column, cy: Column, bias: int = BIAS) -> Column:
    """Interleave two (possibly negative) integer cell coordinates into
    one non-negative long; pure codegen, no UDF. ``bias`` maps negative
    floor-cell coords into the unsigned domain the interleave needs —
    it is an order-preserving translation, so locality is unaffected."""
    cx = cx.cast("long") + F.lit(bias)
    cy = cy.cast("long") + F.lit(bias)
    return _spread(cx).bitwiseOR(F.shiftleft(_spread(cy), 1))


def _spread_py(v: int) -> int:
    v &= 0xFFFFFFFF
    for shift, mask in _SPREAD_ROUNDS:
        v = (v | (v << shift)) & mask
    return v


def morton_key_py(cx: int, cy: int, bias: int = BIAS) -> int:
    """Driver/test twin of :func:`morton_key` (same rounds, same bias)."""
    return _spread_py(cx + bias) | (_spread_py(cy + bias) << 1)


def zorder_key(
    x: Column, y: Column, level: int = 0, base: float = BASE_CELL_M
) -> Column:
    """Morton key of the level-``level`` cell containing (x, y) — the
    clustering key for raw coordinate columns."""
    edge = cell_edge(level, base)
    return morton_key(
        F.floor(x / F.lit(edge)).cast("long"),
        F.floor(y / F.lit(edge)).cast("long"),
    )


def cluster_by_zorder(
    df: DataFrame,
    x: str,
    y: str,
    n_files: int,
    level: int = 0,
    base: float = BASE_CELL_M,
) -> DataFrame:
    """Return ``df`` arranged so a plain parquet/snapshot write produces
    ``n_files`` files, each covering a contiguous z-curve range (a
    compact spatial square): range-partition on the Morton key, sort
    within each partition, drop the key. Row SET is unchanged — only
    placement. One shuffle, same cost class as any repartition; at
    cluster scale this is the compaction job you run once per ingest
    batch, amortized over every box query that follows."""
    key = zorder_key(F.col(x), F.col(y), level, base)
    return (
        df.withColumn("__zorder", key)
        .repartitionByRange(n_files, "__zorder")
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
    )
