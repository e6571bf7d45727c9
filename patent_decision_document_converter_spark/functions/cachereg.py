"""Tracked persist() registry.

Several operators persist an intermediate DataFrame because both sides of
a self-join consume it (LSH band tables, normed vectors).  ``persist`` is
lazy-scoped to the session, so in a long-lived session (repeated
curate_corpus runs, a bench loop, the driver's 33-query contract sweep)
those blocks would otherwise accumulate in executor storage memory until
the session dies.

Operators call :func:`track` instead of ``DataFrame.persist`` and callers
call :func:`release_cached` once the results of a run are materialized
(bench.py and tools/check_contract.py do this between queries;
``curate_corpus`` callers release after materializing the returned frame).
Releasing is always safe: an unpersisted DataFrame silently recomputes
its lineage on the next action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CACHED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """persist() a DataFrame and register it for later bulk release."""
    df = df.persist()
    _CACHED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every tracked DataFrame; returns how many were released."""
    n = 0
    for df in _CACHED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped
    _CACHED.clear()
    return n
