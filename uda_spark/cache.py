"""Lifecycle management for persisted intermediates.

Operators that persist an intermediate (minhash / simhash dedup: the
md5-heavy signature relation feeds both the band explode and the
candidate-verification join) register the handle here instead of calling
``.persist()`` bare.  Long-lived sessions (a REPL, a service, repeated
bench invocations) then call :func:`release_persisted` after the query's
result is materialized to drop the cached blocks deterministically,
instead of waiting for the JVM ContextCleaner to notice the handle is
unreferenced — or worse, accumulating blocks until memory/disk pressure.

``bench.py`` and the oracle-parity tests call ``release_persisted`` after
each query; one-shot drivers that collect-and-exit need not bother.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register the handle for later release."""
    handle = df.persist()
    _TRACKED.append(handle)
    return handle


def release_persisted() -> int:
    """Unpersist (non-blocking) every tracked handle; returns the count."""
    n = 0
    while _TRACKED:
        handle = _TRACKED.pop()
        try:
            handle.unpersist(blocking=False)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
