"""Cache ownership for operators that internally ``.cache()``.

Several operators cache a frame both sides of a self-join scan
(signatures, shingles, span positions) because AQE's
broadcast-conversion defeats Spark's exchange reuse and the frame
would otherwise be computed twice.  In a single query that cache is
harmless -- storage-LRU evicts it eventually -- but a long-lived
service running many corpora through those operators would accumulate
persisted frames it no longer references.

This module makes the caches owned instead of leaked:

- operators cache through ``scoped_cache(df)``, which registers the
  cached frame in a process-wide registry;
- ``cache_scope()`` is a context manager that unpersists every frame
  registered inside its body -- the service wraps one corpus's work in
  one scope and storage returns to baseline;
- ``release_operator_caches()`` drops everything registered so far
  (the blunt instrument for REPL use).

Frames are held weakly-by-list and unpersisted with blocking=False;
unpersisting a frame that was never materialized is a no-op, so the
scope is safe even when the caller never triggered an action.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def scoped_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register the frame for scope-based release."""
    cached = df.cache()
    _LIVE.append(cached)
    return cached


def release_operator_caches() -> int:
    """Unpersist every operator-registered cache; returns the count."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:  # session already stopped -- nothing to free
            pass
    return n


@contextmanager
def cache_scope() -> Iterator[None]:
    """Unpersist every operator cache created inside the scope.

    Usage (a service loop over many corpora)::

        for corpus in corpora:
            with cache_scope():
                pairs = lsh_candidate_pairs(spark.read.parquet(corpus))
                pairs.write.parquet(...)
            # storage back to pre-corpus baseline here
    """
    mark = len(_LIVE)
    try:
        yield
    finally:
        tail = _LIVE[mark:]
        del _LIVE[mark:]
        for df in tail:
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass
