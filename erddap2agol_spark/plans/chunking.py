"""Chunk planning (SURVEY §2.6 W4, §4 O5).

The reference sizes a dataset from metadata (``ncHeader`` row count),
then splits the download into ``ceil(row_count / chunk_size)``
equal-DURATION time slices, the last clamped to the range end
(``calculateTimeSubset`` src/data_wrangler.py:281-314; ``needsSubsetting``
:268-279; default chunk_size 100_000 at :68-70).

In Spark the planner output becomes scan partitions (one task per slice).
The math is deliberately identical so plans are golden-comparable; the
memory-safety role the chunks played in the reference is covered by
Spark's own partitioning/spill, and AQE coalesces slices that turn out
tiny (O5).
"""

from __future__ import annotations

import math
from datetime import datetime

from ..sources.erddap_url import TimeRange

DEFAULT_CHUNK_SIZE = 100_000


def needs_subsetting(row_count: int, chunk_size: int = DEFAULT_CHUNK_SIZE) -> bool:
    return row_count > chunk_size


def n_chunks(row_count: int, chunk_size: int = DEFAULT_CHUNK_SIZE) -> int:
    return max(1, math.ceil(row_count / chunk_size))


def time_slices(
    start: datetime,
    end: datetime,
    row_count: int,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> list[TimeRange]:
    """Equal-duration time slices assuming a uniform record rate over
    [start, end]; the final slice is clamped exactly to ``end``."""
    if end < start:
        raise ValueError("end before start")
    k = n_chunks(row_count, chunk_size)
    total = end - start
    slices: list[TimeRange] = []
    for i in range(k):
        s = start + total * (i / k)
        e = end if i == k - 1 else start + total * ((i + 1) / k)
        slices.append(TimeRange(s, e))
    return slices


def plan_summary(slices: list[TimeRange]) -> dict:
    """Plan facts for golden tests / observability."""
    return {
        "n_chunks": len(slices),
        "start": slices[0].start.isoformat(),
        "end": slices[-1].end.isoformat(),
        "continuous": all(
            slices[i].end == slices[i + 1].start for i in range(len(slices) - 1)
        ),
    }
