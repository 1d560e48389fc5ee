"""Scoped persist tracking — the release path for operator-internal caches.

Several operators persist intermediate projections that outlive the call
(lazy callers consume the returned plan later, so the operator cannot
unpersist before returning): MinHash shingle projections, ANN
corpus/assignment caches, the skew-cap ranked set, incremental-ingest
batch digests. A long-running driver invoking these repeatedly would
accumulate caches until LRU eviction (the leak ``QaResults.release()``
closes for QA profiles — this module is the same hygiene for the
similarity/skew/ingest families).

Usage::

    from apde_etl_spark.operators.cache import tracked_persist, release_scope

    base = tracked_persist(projection, scope="similarity")
    ...                       # build and return the lazy plan
    release_scope("similarity")   # caller, once results are consumed

``release_scope(None)`` releases everything. Unpersisting is non-blocking
and safe while a returned plan is still unconsumed — Spark recomputes the
projection from lineage if it is re-read after release — so releasing is
always correctness-neutral; the only cost of releasing too early is a
recompute.
"""

from __future__ import annotations

import logging
import threading

from pyspark.sql import DataFrame

_LOG = logging.getLogger(__name__)

#: Soft cap per scope: crossing it logs a warning so a long-lived driver
#: that uses persisting operators without knowing the release convention
#: sees the leak instead of silently pinning JVM caches forever. Not a
#: hard limit — tracked frames are the unpersist handles, so dropping
#: them would leak harder, and evicting the JVM cache under a still-lazy
#: caller is correctness-neutral but perf-surprising. The warning fires
#: once per scope per threshold crossing.
SCOPE_WARN_THRESHOLD = 64
_WARNED_SCOPES: set[str] = set()

_LOCK = threading.Lock()
#: scope -> list of persisted DataFrames. STRONG references on purpose:
#: the JVM-side cache outlives the Python wrapper (Spark's CacheManager
#: keys on the logical plan, not on the Python object), so a weak
#: registry would lose its only unpersist handle the moment the
#: operator's local variable goes out of scope. The wrappers are tiny;
#: the JVM cache they pin is exactly what release_scope() frees.
_SCOPES: dict[str, list[DataFrame]] = {}


def tracked_persist(df: DataFrame, scope: str = "default") -> DataFrame:
    """``df.persist()`` registered under ``scope`` for later bulk release."""
    out = df.persist()
    with _LOCK:
        frames = _SCOPES.setdefault(scope, [])
        frames.append(out)
        if len(frames) > SCOPE_WARN_THRESHOLD and scope not in _WARNED_SCOPES:
            _WARNED_SCOPES.add(scope)
            _LOG.warning(
                "cache scope %r holds %d tracked persisted frames "
                "(threshold %d) — call release_scope(%r) after consuming "
                "results, or caches accumulate for the driver's lifetime",
                scope, len(frames), SCOPE_WARN_THRESHOLD, scope,
            )
    return out


def tracked_release(df: DataFrame) -> bool:
    """Unpersist ``df`` AND drop it from the registry — the correct way
    to release a tracked frame early (a bare ``df.unpersist()`` would
    leave a dangling registry entry, inflating ``tracked_count`` and
    ``release_scope`` return values). Returns True if the frame was
    tracked."""
    found = False
    with _LOCK:
        for frames in _SCOPES.values():
            if any(f is df for f in frames):
                frames[:] = [f for f in frames if f is not df]
                found = True
    try:
        df.unpersist()
    except Exception:
        pass  # session already stopped — nothing to release
    return found


def release_scope(scope: str | None = None) -> int:
    """Unpersist every DataFrame tracked under ``scope`` (all scopes when
    ``None``); returns the number released. Idempotent."""
    with _LOCK:
        keys = list(_SCOPES) if scope is None else [scope]
        frames = [f for k in keys for f in _SCOPES.pop(k, [])]
        _WARNED_SCOPES.difference_update(keys)
    n = 0
    for df in frames:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n


def tracked_count(scope: str | None = None) -> int:
    """Number of tracked frames (diagnostics/tests)."""
    with _LOCK:
        keys = list(_SCOPES) if scope is None else [scope]
        return sum(len(_SCOPES.get(k, [])) for k in keys)
