"""Selection-back-to-catalogue join with a size-gated broadcast (J1).

The reference's extraction join is always selection << catalogue
(reference: connectors/connector.py:48-51), so broadcasting the selection
is right for every sampler-produced sampling. But ``run_extraction``
accepts ARBITRARY sampling parquet — an unconditional ``F.broadcast``
on a 10^8-row selection would OOM the driver. SURVEY.md §2.4 J1 already
prescribes the fallback: "salted shuffle join if selection large".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~2M (id, split) rows is tens of MB serialized — the sane ceiling for a
# driver-collected broadcast table; anything larger shuffles.
BROADCAST_ROW_THRESHOLD = 2_000_000


def selection_join(
    catalogue: DataFrame,
    selection: DataFrame,
    on: str | list[str],
    how: str = "inner",
    selection_rows: int | None = None,
    broadcast_threshold: int = BROADCAST_ROW_THRESHOLD,
) -> DataFrame:
    """Join ``selection`` back to the big ``catalogue``.

    Broadcast-hash when the selection is provably small
    (``selection_rows <= broadcast_threshold``); above that, an explicit
    shuffle-hash join — the skew-tolerant-with-AQE shape for a large
    selection, never a driver-side broadcast build. Pass
    ``selection_rows`` when the caller already counted (every pipeline
    here does, for quota/summary logic) to avoid an extra job.
    """
    if selection_rows is None:
        selection_rows = selection.count()
    if selection_rows <= broadcast_threshold:
        return catalogue.join(F.broadcast(selection), on, how)
    return catalogue.join(selection.hint("shuffle_hash"), on, how)
