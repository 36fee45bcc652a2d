"""Lookup (dimension) join.

Parity: Flink ``OdpsLookupFunction.java:42-150`` - probes an in-memory map of
the *entire* dimension table, reloading it when a TTL expires, with retries
on load failure.

Spark-first: the dimension becomes a broadcast DataFrame - the same
whole-table-in-memory semantics, executed as a BroadcastHashJoin with zero
shuffle on the probe side.  TTL refresh maps to re-reading the dim per
micro-batch (streaming) or via ``CachedDimension`` (batch, TTL-bounded reuse).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_CACHE_EXPIRE_MS = 60_000
DEFAULT_MAX_RETRIES = 3


def lookup_join(
    probe: DataFrame,
    dim: DataFrame,
    on: dict[str, str],
    how: str = "left",
) -> DataFrame:
    """Join ``probe`` against a broadcast ``dim``; ``on`` maps probe-column ->
    dim-column.  Default 'left' matches lookup-join semantics (unmatched probe
    rows survive with NULL dim columns)."""
    cond = None
    for pk, dk in on.items():
        c = probe[pk] == dim[dk]
        cond = c if cond is None else (cond & c)
    return probe.join(F.broadcast(dim), cond, how)


class CachedDimension:
    """TTL-cached dimension loader (cacheExpireMs + retry semantics of
    OdpsLookupFunction; the reload-on-expiry happens lazily on access)."""

    def __init__(
        self,
        loader: Callable[[], DataFrame],
        cache_expire_ms: int = DEFAULT_CACHE_EXPIRE_MS,
        max_retries: int = DEFAULT_MAX_RETRIES,
    ):
        self._loader = loader
        self._ttl = cache_expire_ms / 1000.0
        self._retries = max_retries
        self._loaded_at: float | None = None
        self._df: DataFrame | None = None

    def get(self) -> DataFrame:
        now = time.monotonic()
        if self._df is None or self._loaded_at is None or now - self._loaded_at > self._ttl:
            err = None
            for _ in range(self._retries):
                try:
                    df = self._loader()
                    df = df.cache()
                    df.count()  # materialize now, as the reference's eager load
                    if self._df is not None:
                        self._df.unpersist()
                    self._df = df
                    # TTL starts when the load COMPLETES - timing from method
                    # entry made any load slower than the TTL permanently stale
                    self._loaded_at = time.monotonic()
                    err = None
                    break
                except Exception as e:  # retry on load failure
                    err = e
            if err is not None:
                raise err
        return self._df

    def join(self, probe: DataFrame, on: dict[str, str], how: str = "left") -> DataFrame:
        return lookup_join(probe, self.get(), on, how)
