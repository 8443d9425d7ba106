"""Session-scoped materialization of derived indexes.

Dedup/similarity pipelines share expensive derived tables: the MinHash
signature matrix, the SimHash signature column, the LSH band buckets.
Each is O(|docs|) fixed-width rows — an *index*, not a data expansion —
so persisting it is scale-safe (a production pipeline materializes
signatures once, then runs every consumer against them; reference
behavior recomputes per query only because it streams one query at a
time). Keyed by (applicationId, sf_dir, name) so a new session or a
different dataset rebuilds instead of serving stale frames.

The gram/shingle EXPLOSION is deliberately never cached: at corpus
scale it is a multi-PB intermediate and recomputing it per consumer is
cheaper than spilling it to storage.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def session_index(
    spark: SparkSession, sf_dir: str, name: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the per-session materialized index `name` for `sf_dir`,
    building and persisting it on first use (MEMORY_AND_DISK, so an
    oversized index spills instead of evicting or OOMing)."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _CACHE.get(key)
    if df is None:
        df = build().persist()
        _CACHE[key] = df
    return df
