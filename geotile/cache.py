"""Persisted-frame bookkeeping for multi-round operators.

Operators that persist intermediates (expanding-ring kNN, LSH pairs)
attach them to their result frame; callers free executor cache with
:func:`release` once the result is materialized.  Without this, cached
blocks accumulate for the life of a long-running driver session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def track(result: DataFrame, frames: list[DataFrame]) -> DataFrame:
    """Attach intermediate persisted frames to ``result`` for later
    :func:`release` by the caller."""
    result._geotile_persisted = list(frames)  # type: ignore[attr-defined]
    return result


def release(result: DataFrame) -> None:
    """Unpersist everything an operator cached for ``result`` (no-op if
    nothing was tracked).  Call AFTER materializing the result."""
    for f in getattr(result, "_geotile_persisted", []):
        f.unpersist()
