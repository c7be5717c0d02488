"""Session-scoped staged-relation registry.

Several catalog queries consume the SAME expensive intermediate — e.g.
q_near_dup, q_dup_clusters, and the q_curation_pipeline composite all
verify the identical MinHash-LSH candidate relation (same shingle width,
hash count, banding, threshold). Each of those relations is already
materialized eagerly by its builder (``localCheckpoint``) because it is
small and multi-consumed; rebuilding it per query re-runs the whole LSH
staging (~3.9 s at sf0.1 — round 4's honest-timer finding).

``staged`` memoizes the materialized relation per (Spark application,
key): the first consumer in a session pays the build, later consumers
reuse the checkpointed result. This is exactly what a production
pipeline does — write the candidate relation once, read it from the
staging table everywhere — expressed at session scope. Keys must encode
EVERY parameter that shapes the relation (input dir, dials); the
registry never invalidates within an application (inputs here are
immutable test fixtures; a production table would version by snapshot).

The cache holds DataFrame handles to localCheckpoint'd (RDD-backed)
relations only — tiny survivor/pair sets, never raw corpus relations —
so the memory cost per entry is the checkpointed partitions themselves,
which the builders already paid.
"""

from __future__ import annotations

import threading
from typing import Callable, Hashable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}
_LOCK = threading.Lock()


def staged(
    spark: SparkSession, key: Hashable, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the memoized relation for ``key``, building it (once per
    Spark application) via ``build`` — which must return an eagerly
    materialized DataFrame (e.g. ``localCheckpoint()``), since the handle
    is reused across queries and must not re-trigger lineage.

    Entries keyed by OTHER applications are evicted on every access: a
    long-lived process that stops one SparkSession and starts another
    would otherwise accumulate dead DataFrame handles (and pin their
    checkpointed RDD references) forever. The lock makes check-evict-
    insert atomic; ``build`` runs outside it (it launches Spark jobs and
    may take seconds — a concurrent caller for the same key would then
    build twice, which is wasteful but correct, and the handle stored
    last wins).
    """
    app_id = spark.sparkContext.applicationId
    full_key = (app_id, key)
    with _LOCK:
        stale = [k for k in _CACHE if k[0] != app_id]
        for k in stale:
            del _CACHE[k]
        df = _CACHE.get(full_key)
    if df is None:
        df = build()
        with _LOCK:
            _CACHE[full_key] = df
    return df


def staged_value(
    spark: SparkSession, key: Hashable, build: Callable[[], object]
) -> object:
    """``staged`` for non-DataFrame artifacts — e.g. the (path, version)
    handle of a persisted serving index, built once per application and
    probed by every later query. Same eviction/locking discipline; the
    built value must be self-contained (no lazy Spark lineage)."""
    app_id = spark.sparkContext.applicationId
    full_key = (app_id, key)
    with _LOCK:
        stale = [k for k in _CACHE if k[0] != app_id]
        for k in stale:
            del _CACHE[k]
        if full_key in _CACHE:
            return _CACHE[full_key]
    val = build()
    with _LOCK:
        _CACHE[full_key] = val
    return val


def _unpersist_handle(v: object) -> None:
    """Best-effort synchronous release of a localCheckpoint'd
    DataFrame's storage blocks. Without this, a cleared entry's blocks
    wait for Python GC + the JVM ContextCleaner (asynchronous), so a
    long shared-JVM session — the bench runs ~120 entries in one — can
    accumulate dead checkpoint blocks between measurements (r12
    deferred candidate #4). Only LogicalRDD-rooted plans (what
    ``localCheckpoint`` returns, per the ``staged`` contract) own
    blocks to release; anything else is left to the normal GC path."""
    if not isinstance(v, DataFrame):
        return
    try:
        plan = v._jdf.queryExecution().analyzed()
        if plan.nodeName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass  # release is an optimization; never fail a clear()


def clear() -> None:
    """Drop all memoized handles (tests / benchmarks that must re-pay
    staging call this between measurements) and synchronously release
    their checkpoint blocks. Handles must not be used after clear() —
    a localCheckpoint cannot recompute — which was already the
    registry's contract (every consumer re-resolves through
    ``staged``)."""
    with _LOCK:
        vals = list(_CACHE.values())
        _CACHE.clear()
    for v in vals:
        _unpersist_handle(v)
