"""WMS patch fetch with bounded retry (SURVEY.md §2.1 S7).

The reference fetches orthophoto patches from a WMS endpoint and retries
failed GetMap calls a bounded number of times before giving up
(reference: extractors/bd_ortho_today.py:67-77). Spark mapping: a
``mapInPandas`` pass over the sampling — each Arrow batch issues its
fetches sequentially (the service is the bottleneck, not the CPU), with
per-request retry + exponential backoff and a per-row error column
instead of a task abort, so one bad patch never kills a 10^6-patch job.

The HTTP call itself is PLUGGABLE (``fetcher``): this container has no
network, so the default fetcher raises NotImplementedError — tests inject
deterministic/flaky fetchers to exercise the retry machinery, and on a
cluster the caller passes e.g. a requests-based GetMap closure.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

WMS_SCHEMA = "image_id string, split string, bytes binary, n_attempts int, error string"

Fetcher = Callable[[str, tuple[float, float, float, float]], bytes]


def default_fetcher(image_id: str, bbox: tuple[float, float, float, float]) -> bytes:
    raise NotImplementedError(
        "no network in this environment — pass a requests-based GetMap fetcher"
    )


def fetch_with_retry(
    fetcher: Fetcher,
    image_id: str,
    bbox: tuple[float, float, float, float],
    max_retries: int = 3,
    backoff_sec: float = 0.0,
) -> tuple[bytes | None, int, str | None]:
    """Bounded retry (reference: bd_ortho_today.py:67-77): up to
    1 + max_retries attempts, exponential backoff, returns
    (payload | None, attempts, last_error | None)."""
    err = None
    for attempt in range(1, max_retries + 2):
        try:
            return fetcher(image_id, bbox), attempt, None
        except Exception as exc:  # noqa: BLE001 — remote service: any failure retries
            err = f"{type(exc).__name__}: {exc}"
            if attempt <= max_retries and backoff_sec:
                time.sleep(backoff_sec * (2 ** (attempt - 1)))
    return None, max_retries + 1, err


def wms_extract(
    sampling: DataFrame,
    fetcher: Fetcher = default_fetcher,
    max_retries: int = 3,
    backoff_sec: float = 0.0,
) -> DataFrame:
    """S7: fetch one patch per sampling row. sampling needs
    (image_id, split, geom_xmin, geom_ymin, geom_xmax, geom_ymax)."""

    cols = ["image_id", "split", "geom_xmin", "geom_ymin", "geom_xmax", "geom_ymax"]

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                bbox = (r.geom_xmin, r.geom_ymin, r.geom_xmax, r.geom_ymax)
                payload, attempts, err = fetch_with_retry(
                    fetcher, r.image_id, bbox, max_retries, backoff_sec
                )
                rows.append((r.image_id, r.split, payload, attempts, err))
            yield pd.DataFrame(
                rows, columns=["image_id", "split", "bytes", "n_attempts", "error"]
            )

    return sampling.select(*cols).mapInPandas(work, schema=WMS_SCHEMA)
