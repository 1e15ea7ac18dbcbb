"""Tracked persist for operator-internal subplans.

Several operators persist a shared subplan (e.g. minhash signatures
referenced by a hot-bucket pre-pass plus both self-join sides) because
Spark cannot CSE across self-joins — without the persist the expensive
stage re-executes up to 4x. The flip side is a leak: operators return lazy
DataFrames, so they cannot unpersist before the caller's action, and
repeated invocations in a long-lived session accumulate cached blocks
(bench.py only stays honest because it clearCache()s between repeats).

This module tracks every operator-internal persist so callers can release
them after the consuming action:

    from bb_ocr_spark.cache import release_persisted
    result = minhash_lsh_pairs(df).collect()   # action consumes the cache
    release_persisted()                        # drop the tracked blocks

At 100 TB the equivalent is materializing the shared stage as a table
(signatures are reused across many downstream jobs anyway); the in-session
persist is the local[..]/interactive shape of the same decision.
"""

from __future__ import annotations

import threading

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_LOCK = threading.Lock()  # concurrent sessions/threads may track at once


def _prune_locked() -> None:
    # drop handles whose cache is already gone (caller unpersisted, or
    # catalog.clearCache() as bench.py does between repeats) so a
    # long-lived session doesn't accumulate dead DataFrame refs; callers
    # hold _LOCK
    alive = []
    for df in _TRACKED:
        try:
            lvl = df.storageLevel
            if lvl.useMemory or lvl.useDisk:
                alive.append(df)
        except Exception:  # session stopped — handle is dead either way
            pass
    _TRACKED[:] = alive


def track_persist(df: DataFrame) -> DataFrame:
    """persist(MEMORY_AND_DISK) + register for release_persisted()."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    with _LOCK:
        _prune_locked()
        _TRACKED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked operator-internal cache; returns how many
    handles were released. Safe to call at any time — Spark unpersist is
    idempotent and lazy plans re-persist on next use."""
    with _LOCK:
        tracked, _TRACKED[:] = list(_TRACKED), []
    n = len(tracked)
    for df in tracked:
        try:
            df.unpersist()
        except Exception:  # session already stopped
            pass
    return n
