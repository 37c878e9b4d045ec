"""Operator-intermediate cache registry (round-3 advisory + verdict #7).

Several operators persist an intermediate frame that IS their index —
the MinHash shingle set, the TF-IDF postings, the buffered-filter mask.
Each ``persist()`` lives for the session unless released, so a long-
lived driver that calls these operators repeatedly would accumulate
executor cache indefinitely.  This module gives those persists two
things:

- a CONFIGURABLE STORAGE LEVEL: ``SPARK_GRAFT_CACHE_LEVEL`` (default
  ``MEMORY_AND_DISK``).  At 100 TB the shingled corpus is ~10× the raw
  text — big-corpus deployments set ``MEMORY_AND_DISK_SER`` or
  ``DISK_ONLY`` so the index spills instead of evicting the executors
  (docs/SCALE.md §caches);
- a CLEANUP HOOK: ``release_caches()`` unpersists every tracked frame.
  Call it when the consuming action is done (bench.py's
  ``clearCache()`` between runs is the blunter equivalent).  Releasing
  early never breaks correctness — downstream plans recompute from
  lineage — it only forfeits the reuse.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# Python StorageLevel constants vary across Spark majors (4.x dropped
# the _SER alias; its MEMORY_AND_DISK is already serialized-in-JVM and
# MEMORY_AND_DISK_DESER is the deserialized form) — resolve defensively.
_LEVELS = {
    name: getattr(StorageLevel, name)
    for name in (
        "MEMORY_ONLY",
        "MEMORY_AND_DISK",
        "MEMORY_AND_DISK_SER",
        "MEMORY_AND_DISK_DESER",
        "DISK_ONLY",
    )
    if hasattr(StorageLevel, name)
}

_LIVE: list[DataFrame] = []


def operator_storage_level() -> StorageLevel:
    name = os.environ.get("SPARK_GRAFT_CACHE_LEVEL", "MEMORY_AND_DISK").upper()
    return _LEVELS.get(name, StorageLevel.MEMORY_AND_DISK)


def persist_tracked(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist at the configured level and register for release."""
    out = df.persist(level or operator_storage_level())
    _LIVE.append(out)
    return out


def release_caches() -> int:
    """Unpersist every tracked operator cache; returns how many."""
    n = 0
    while _LIVE:
        try:
            _LIVE.pop().unpersist()
            n += 1
        except Exception:
            pass
    return n
